package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Max-cosine-against-a-reference-set kernel: one call per row
  * computing max_i cos(vec, ref_i) over a driver-held matrix of
  * reference vectors (eval suites, centroid sets — anything
  * model-state-sized). The matrix rides the codegen context as a
  * REFERENCE OBJECT (ctx.addReferenceObj), so the plan stays O(1) in
  * the reference count — inlining one typedLit array per reference
  * into a greatest(...) tree re-optimizes a thousands-of-children
  * expression every micro-batch and blows whole-stage codegen's
  * method limit (the SignBuckets lesson).
  *
  * Bit-exactness with the DataFrame formulation
  * ([[graft.sim.Ann.dot]] → cosinePre): dots fold left-to-right with
  * per-element double casts, the row norm is sqrt of the self-dot,
  * each cosine is dot/(cn·en) guarded at d > 0, and max over doubles
  * is order-independent — so the kernel's verdict is bit-identical to
  * the batch [[graft.sim.SemanticDecontam.report]] scores.
  */
object MaxCosineKernel {
  /** @param refs   row-major [n, dim] flattened reference matrix
    * @param norms  per-reference norms (engine-computed upstream)
    */
  def maxCosine(vec: ArrayData, vecFloat: Boolean, refs: Array[Double],
      norms: Array[Double], dim: Int): Double = {
    var self = 0.0d
    var j = 0
    while (j < dim) {
      val x = if (vecFloat) vec.getFloat(j).toDouble else vec.getDouble(j)
      self += x * x
      j += 1
    }
    val cn = math.sqrt(self)
    var best = Double.NegativeInfinity
    var i = 0
    while (i < norms.length) {
      var dot = 0.0d
      var k = 0
      val off = i * dim
      while (k < dim) {
        val x = if (vecFloat) vec.getFloat(k).toDouble else vec.getDouble(k)
        dot += x * refs(off + k)
        k += 1
      }
      val d = cn * norms(i)
      val c = if (d > 0) dot / d else 0.0d
      if (c > best) best = c
      i += 1
    }
    best
  }
}

/** max_i cos(child, ref_i) — one codegen'd kernel call per row. */
case class MaxCosineExpr(child: Expression, refs: Seq[Double],
    norms: Seq[Double], dim: Int) extends UnaryExpression {
  require(dim >= 1 && norms.nonEmpty && refs.length == norms.length * dim,
    "refs must be the row-major [n, dim] matrix matching norms")

  // analysis-time type gate (the repo discipline, e.g. TopKAgg /
  // CovMoments): a wrong input fails before a job launches, not as a
  // ClassCastException inside a running stage
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"max_cosine requires array<float|double>, got ${t.sql}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"max_cosine needs an array<float|double> input, got $t")
  }
  @transient private lazy val vFloat = isFloat
  @transient private lazy val refArr = refs.toArray
  @transient private lazy val normArr = norms.toArray

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MaxCosineKernel.maxCosine(input.asInstanceOf[ArrayData],
      vFloat, refArr, normArr, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("maxCosRefs", refArr, "double[]")
    val nRef = ctx.addReferenceObj("maxCosNorms", normArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.MaxCosineKernel.maxCosine(
         |  $c, $vFloat, $rRef, $nRef, $dim);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MaxCosineExpr =
    copy(child = newChild)
}

object MaxCosine {
  def max_cosine(vec: Column, refs: Seq[Seq[Double]],
      norms: Seq[Double]): Column = {
    require(refs.nonEmpty && refs.forall(_.length == refs.head.length))
    Bridge.toColumn(MaxCosineExpr(Bridge.toExpression(vec),
      refs.flatten, norms, refs.head.length))
  }
}
