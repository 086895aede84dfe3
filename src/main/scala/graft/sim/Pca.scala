package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** PCA over an embedding column — the rotation that whitening, OPQ
  * subspace balancing, and dimensionality reduction all start from.
  * Spark-shaped in two bounded pieces:
  *
  *  1. the COVARIANCE pass is one [[CovMoments]] aggregate: each
  *     partition folds its vectors into a (n, Σx, Σxxᵀ) buffer of
  *     1 + d + d² doubles (d = 64 → ~33 KB), partials merge by
  *     addition — one narrow pass, O(parts·d²) shuffle, never a
  *     per-pair join;
  *  2. the eigendecomposition runs on the DRIVER over the d×d matrix
  *     (cyclic Jacobi — a 64×64 symmetric solve is microseconds),
  *     the canonical bounded-model-state step, exactly like k-means
  *     centroid updates.
  *
  * The fitted rotation applies as the native [[RotateVec]] expression
  * (matrix as a codegen reference object, one kernel call per row —
  * the [[graft.functions.SignBuckets]] design), so projection is a
  * narrow codegen'd map at any scale. Double sums make the fitted
  * basis partition-order-sensitive at the last ulps, so the model is
  * spec-verified by PROPERTIES (orthonormality, variance ordering,
  * norm preservation, reconstruction) rather than hash-gated — the
  * same standing as the bucketed-write and compaction operators.
  */
object Pca {

  /** Column-major-free model: `basis(k)` is the k-th eigenvector (one
    * row of the rotation), eigenvalues descending, signs normalized so
    * each vector's largest-|component| entry is positive.
    */
  final case class Model(eigenvalues: Seq[Double], basis: Seq[Seq[Double]],
      mean: Seq[Double])

  def fit(df: DataFrame, vecCol: String, dim: Int): Model = {
    val flat = df.select(Bridge.toColumn(
      CovMoments(Bridge.toEagerExpression(col(vecCol)), dim)
        .toAggregateExpression()).as("m"))
      .head().getSeq[Double](0).toArray
    val n = flat(0)
    require(n > 0, "cannot fit PCA on an empty corpus")
    val mean = Array.tabulate(dim)(i => flat(1 + i) / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      flat(1 + dim + i * dim + j) / n - mean(i) * mean(j)
    }
    val (vals, vecs) = jacobi(cov)
    // sort desc, normalize signs
    val order = vals.zipWithIndex.sortBy(-_._1).map(_._2)
    val basis = order.map { k =>
      val v = Array.tabulate(dim)(i => vecs(i)(k))
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v.map(x => -x).toSeq else v.toSeq
    }
    Model(order.map(vals(_)).toSeq, basis.toSeq, mean.toSeq)
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (eigenvalues,
    * eigenvector MATRIX with vectors in columns). Deterministic —
    * fixed sweep order, fixed iteration cap.
    */
  private[sim] def jacobi(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 50 && offDiag(a) > 1e-12) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    s
  }

  /** Project (optionally mean-centered) vectors onto the top-k basis
    * rows — a narrow codegen'd map via [[RotateVec]].
    */
  def transform(vec: Column, m: Model, k: Int, center: Boolean = true): Column = {
    require(k > 0 && k <= m.basis.length, s"k must lie in [1, ${m.basis.length}]")
    val dim = m.mean.length
    val mat = m.basis.take(k).flatten.toArray
    val mu = if (center) m.mean.toArray else Array.fill(dim)(0.0)
    Bridge.toColumn(RotateVec(
      Bridge.toExpression(vec), mat, mu, k, dim))
  }

  /** OPQ-parametric-style basis reordering for product quantization:
    * deal the eigen-dims ROUND-ROBIN across `m` subspaces (subspace j
    * gets eigen rows j, j+m, j+2m, …), balancing the per-subspace
    * variance products that PQ's independent codebooks each have to
    * cover. PCA's default descending order is the WORST PQ split —
    * one subspace hoards all the variance while the rest quantize
    * noise; the deal is the published parametric initialization of
    * OPQ. PcaSpec measures the effect end-to-end: rotated+balanced PQ
    * encodes with materially lower total quantization error than PQ
    * on the raw correlated vectors.
    */
  def balancedForPq(model: Model, m: Int): Model = {
    val d = model.basis.length
    require(m >= 1 && d % m == 0, s"dim $d must split into m=$m subspaces")
    val w = d / m
    val order = for (j <- 0 until m; t <- 0 until w) yield t * m + j
    Model(order.map(model.eigenvalues), order.map(model.basis), model.mean)
  }

  /** Whitening projection: [[transform]] with each basis row scaled by
    * 1/√(λ+eps), so the projected corpus has ≈ identity covariance —
    * the preprocessing that makes Euclidean quantizers treat every
    * direction equally. Same narrow kernel; the scaling folds into the
    * reference-object matrix at plan build.
    */
  def whiten(vec: Column, m: Model, k: Int, eps: Double = 1e-9): Column = {
    require(k > 0 && k <= m.basis.length, s"k must lie in [1, ${m.basis.length}]")
    val dim = m.mean.length
    val mat = m.basis.take(k).zip(m.eigenvalues.take(k)).flatMap {
      case (row, ev) =>
        val s = 1.0 / math.sqrt(math.max(ev, 0.0) + eps)
        row.map(_ * s)
    }.toArray
    Bridge.toColumn(RotateVec(
      Bridge.toExpression(vec), mat, m.mean.toArray, k, dim))
  }

  /** JVM kernel shared by eval and codegen. */
  def rotateKernel(vec: ArrayData, isFloat: Boolean, mat: Array[Double],
      mean: Array[Double], k: Int, dim: Int): ArrayData = {
    if (vec.numElements() != dim) return null
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      x(i) = (if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)) -
        mean(i)
      i += 1
    }
    val out = new Array[Any](k)
    var r = 0
    while (r < k) {
      var acc = 0.0
      var j = 0
      val base = r * dim
      while (j < dim) { acc += mat(base + j) * x(j); j += 1 }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** (n, Σx, Σxxᵀ) moments of an embedding column in one bounded
  * buffer of 1 + d + d² doubles — the covariance pass of [[Pca]].
  * Output: array<double> [n, sums…, prods… (row-major)].
  */
case class CovMoments(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  require(dim > 0 && dim <= 4096, "dim must lie in [1, 4096]")

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"cov_moments needs array<float|double>, got $t")
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cov_moments requires array<float|double>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  private val size = 1 + dim + dim * dim

  override def createAggregationBuffer(): Array[Double] = new Array[Double](size)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == dim) {
        val x = new Array[Double](dim)
        var i = 0
        var ok = true
        while (i < dim && ok) {
          if (arr.isNullAt(i)) ok = false
          else {
            x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
            i += 1
          }
        }
        if (ok) {
          buf(0) += 1.0
          i = 0
          while (i < dim) {
            buf(1 + i) += x(i)
            var j = 0
            val base = 1 + dim + i * dim
            while (j < dim) { buf(base + j) += x(i) * x(j); j += 1 }
            i += 1
          }
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < size) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.map(java.lang.Double.valueOf).asInstanceOf[Array[AnyRef]])

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * size)
    var i = 0
    while (i < size) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new Array[Double](size)
    var i = 0
    while (i < size) { buf(i) = bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CovMoments =
    copy(child = newChild)
}

/** Mean-center + rotate a vector by a fitted [[Pca.Model]] basis —
  * matrix as a codegen reference object, one kernel call per row.
  */
case class RotateVec(child: Expression, mat: Array[Double],
    mean: Array[Double], k: Int, dim: Int)
    extends UnaryExpression {
  require(mat.length == k * dim && mean.length == dim,
    "matrix must be row-major [k, dim] with a dim-length mean")

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Pca.rotateKernel(input.asInstanceOf[ArrayData], isFloat, mat, mean, k, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("pcaMat", mat, "double[]")
    val muRef = ctx.addReferenceObj("pcaMean", mean, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""${ev.value} = graft.sim.Pca.rotateKernel(
         |  $c, $isFloat, $mRef, $muRef, $k, $dim);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RotateVec =
    copy(child = newChild)
}
