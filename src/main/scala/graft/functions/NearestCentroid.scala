package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Nearest-centroid argmin kernel — the codegen-friendly form of
  * [[graft.sim.KMeans.bestOf]]'s literal-candidate `array_min`.
  *
  * The composed form inlines k candidate structs, each carrying a
  * DotFold call over the full vector; past k·dim ≈ a few hundred the
  * whole-stage-generated method for the fused
  * assign→posexplode→partial-agg stage exceeds Janino's 64 KB method
  * limit and Spark silently runs THAT STAGE interpreted ("Code grows
  * beyond 64 KB" — measured in the r13 sf1 verify log on the
  * q_kmeans/q_cluster_purity/q_semdedup/q_ivf_append family). This
  * node carries the centroid matrix as codegen REFERENCE OBJECTS
  * (the [[MaxCosineExpr]] / Spark BloomFilterMightContain design), so
  * the generated code is ONE static kernel call regardless of k·dim
  * and the stage stays inside whole-stage codegen.
  *
  * Bit-exactness contract (four scale factors of strict hash gates sit
  * on top of this arithmetic):
  *  - the per-centroid distance is exactly the composed form's
  *    `xx − 2·dot(x, c) + cc`, with the dot folded LEFT-TO-RIGHT over
  *    double components (the [[DotFold]] order) and `cc` precomputed
  *    by the caller with the same left fold;
  *  - the argmin reproduces Spark's struct-min ordering over
  *    (dist2, cluster): doubles compare with `x == y` short-circuit
  *    then `java.lang.Double.compare` (Spark's SQLOrderingUtil
  *    semantics: -0.0 == 0.0, NaN greatest), ties fall through to the
  *    smaller cluster id — regardless of centroid order in the model.
  *
  * Null contract: a null vector or null self-dot returns null (the
  * standard binary null propagation); a null element or a
  * length-mismatched vector also returns null — the composed form
  * produced a struct with a null dist2 there, a shape no caller
  * consumes (all inputs are non-null fixed-dim embeddings; the
  * analysis-time type gate rejects anything else).
  */
object NearestCentroidKernel {
  /** @param cents row-major [n, dim] flattened centroid matrix
    * @param ccs   per-centroid self-dots (caller-computed left fold)
    * @param ids   per-centroid cluster ids (parallel to `ccs`)
    */
  def best(vec: ArrayData, xx: Double, cents: Array[Double],
      ccs: Array[Double], ids: Array[Int], dim: Int): InternalRow = {
    if (vec.numElements() != dim) return null
    val x = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      if (vec.isNullAt(j)) return null
      x(j) = vec.getDouble(j)
      j += 1
    }
    var bestD = 0.0d
    var bestCl = 0
    var have = false
    var i = 0
    while (i < ids.length) {
      var dot = 0.0d
      val off = i * dim
      var k = 0
      while (k < dim) {
        dot += x(k) * cents(off + k)
        k += 1
      }
      val d = xx - 2.0 * dot + ccs(i)
      val cl = ids(i)
      // Spark struct-min ordering: dist2 compares with the == short
      // circuit (-0.0 == 0.0) then Double.compare (NaN greatest, and
      // NaN vs NaN a TIE); equal dist2 falls through to the smaller
      // cluster id
      val cmp =
        if (!have) -1
        else if (d == bestD) 0
        else java.lang.Double.compare(d, bestD)
      if (cmp < 0 || (cmp == 0 && cl < bestCl)) {
        bestD = d; bestCl = cl; have = true
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](bestD, bestCl))
  }
}

/** `struct(dist2, cluster)` of the nearest centroid to `left` (an
  * array<double> vector) given `right` = the vector's self-dot staged
  * by the caller. See [[NearestCentroidKernel]] for the exactness and
  * null contracts.
  */
case class NearestCentroidExpr(left: Expression, right: Expression,
    cents: Seq[Double], ccs: Seq[Double], ids: Seq[Int], dim: Int)
    extends BinaryExpression {
  require(dim >= 1 && ids.nonEmpty && ccs.length == ids.length &&
    cents.length == ids.length * dim,
    "cents must be the row-major [n, dim] matrix matching ccs/ids")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid requires (array<double>, double), " +
          s"got (${l.sql}, ${r.sql})")
    }

  @transient private lazy val centArr = cents.toArray
  @transient private lazy val ccArr = ccs.toArray
  @transient private lazy val idArr = ids.toArray

  override def dataType: DataType = StructType(Seq(
    StructField("dist2", DoubleType, nullable = false),
    StructField("cluster", IntegerType, nullable = false)))
  // null on null input, null element, or a length-mismatched vector
  override def nullable: Boolean = true

  override def nullSafeEval(x: Any, xx: Any): Any =
    NearestCentroidKernel.best(x.asInstanceOf[ArrayData],
      xx.asInstanceOf[Double], centArr, ccArr, idArr, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ncCents", centArr, "double[]")
    val ccRef = ctx.addReferenceObj("ncCcs", ccArr, "double[]")
    val idRef = ctx.addReferenceObj("ncIds", idArr, "int[]")
    nullSafeCodeGen(ctx, ev, (x, xx) =>
      s"""${ev.value} = graft.functions.NearestCentroidKernel.best(
         |  $x, $xx, $cRef, $ccRef, $idRef, $dim);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidExpr =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  /** @param ids   cluster ids, parallel to `cents`
    * @param cents per-centroid component vectors (all the same length)
    * @param ccs   per-centroid self-dots, LEFT-FOLD computed by the
    *              caller (`KMeans.selfDot`) so the distance arithmetic
    *              stays bit-identical to the composed form
    */
  def nearest_centroid(x: Column, xx: Column, ids: Seq[Int],
      cents: Seq[Seq[Double]], ccs: Seq[Double]): Column = {
    require(cents.nonEmpty && cents.forall(_.length == cents.head.length),
      "centroids must share one dimensionality")
    Bridge.toColumn(NearestCentroidExpr(Bridge.toExpression(x),
      Bridge.toExpression(xx), cents.flatten, ccs, ids, cents.head.length))
  }
}
