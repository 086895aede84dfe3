package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Full (non-parametric) OPQ — Optimized Product Quantization: learn
  * the orthonormal rotation R AND the PQ codebooks jointly by
  * alternating minimization of the quantization error
  * Σ ‖R(x−μ) − ŷ‖², the published remainder over [[Pca.balancedForPq]]
  * (which is OPQ's parametric INITIALIZATION only):
  *
  *  1. codebook step — fix R, rotate the corpus (one narrow
  *     [[RotateVec]] map) and train the m sub-codebooks with the
  *     fused [[ProductQuantizer.fit]] Lloyd rounds;
  *  2. rotation step — fix the codebooks, reconstruct each vector ŷ
  *     from its nearest centroids (a literal-centroid expression, no
  *     shuffle), fold the corpus into the d×d cross-moment matrix
  *     M = Σ (x−μ)·ŷᵀ with ONE [[CrossMoments]] aggregate
  *     (1 + d + d² doubles per partition, partials merge by addition
  *     — the [[CovMoments]] scale shape), and solve the orthogonal
  *     Procrustes problem max_R tr(R·M) on the DRIVER: SVD M = U·S·Vᵀ
  *     (via [[Pca.jacobi]] on MᵀM — a 64×64 symmetric solve,
  *     microseconds) gives R = V·Uᵀ.
  *
  * Every distributed pass is bounded-model-state: centroids and the
  * rotation ride as expression literals/reference objects, the only
  * driver-side data are d×d matrices and m×k codebooks. Like PCA, the
  * double-summed moments make the fitted model partition-order
  * sensitive at the last ulps, so OPQ sits in the spec-verified class
  * (orthonormality, Procrustes exact-recovery, strict error
  * improvement over the parametric init on correlated fixtures) —
  * OpqSpec pins all three.
  */
object Opq {

  /** `rotation` is row-major d×d (row r = output dim r), applied to
    * mean-centered vectors; `pq` is trained in the ROTATED space.
    */
  final case class Model(rotation: Array[Double], mean: Array[Double],
      dims: Int, pq: ProductQuantizer.Model)

  /** Rotate `vec` into the model's quantization space. */
  def rotate(vec: Column, rotation: Array[Double], mean: Array[Double],
      dims: Int): Column =
    Bridge.toColumn(RotateVec(
      Bridge.toExpression(vec), rotation, mean, dims, dims))

  /** Nearest-centroid reconstruction ŷ of a rotated vector — m slice
    * argmins against literal codebooks, concatenated. Narrow, no
    * shuffle; the same assignment arithmetic as PQ encode.
    */
  private def reconExpr(y: Column, pq: ProductQuantizer.Model): Column = {
    val w = pq.width
    concat(pq.codebooks.zipWithIndex.map { case (book, j) =>
      val s = slice(y, j * w + 1, w)
      val cl = KMeans.bestOf(s,
        graft.functions.TextHashes.dot_fold(s, s), book).getField("cluster")
      element_at(
        array(book.centroids.sortBy(_._1).map(c => typedLit(c._2)): _*),
        cl + 1)
    }: _*)
  }

  /** Alternate codebook training and Procrustes rotation updates for
    * `rounds` rounds, starting from the [[Pca.balancedForPq]]
    * parametric init. The final round trains codebooks only, so the
    * returned codebooks are exactly aligned with the returned R.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, dims: Int,
      m: Int, k: Int, pqIters: Int = 3, rounds: Int = 3): Model = {
    require(rounds >= 1, "need at least one codebook round")
    val pca = Pca.fit(df, vecCol, dims)
    val init = Pca.balancedForPq(pca, m)
    val mean = pca.mean.toArray
    var r = init.basis.flatten.toArray
    val x = graft.CacheRegistry.register(
      df.select(col(idCol), col(vecCol).cast(ArrayType(DoubleType)).as("__x"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    var pq: ProductQuantizer.Model = null
    var round = 0
    while (round < rounds) {
      val rotated = x.select(col(idCol), rotate(col("__x"), r, mean, dims).as("__y"))
      // warm-started after round 0: fresh per-round inits would
      // re-randomize the Lloyd local minimum and break the monotone
      // alternation (rotation update + continued Lloyd both descend)
      pq = ProductQuantizer.fit(rotated, idCol, "__y", dims, m, k, pqIters,
        warmStart = Option(pq))
      if (round < rounds - 1) {
        val withY = x.withColumn("__y", rotate(col("__x"), r, mean, dims))
        val flat = withY.select(Bridge.toColumn(
          CrossMoments(Bridge.toEagerExpression(col("__x")),
            Bridge.toEagerExpression(reconExpr(col("__y"), pq)), dims)
            .toAggregateExpression()).as("cm"))
          .head().getSeq[Double](0).toArray
        val mMat = Array.tabulate(dims, dims) { (i, j) =>
          flat(1 + dims + i * dims + j) - mean(i) * flat(1 + j)
        }
        r = procrustes(mMat)
      }
      round += 1
    }
    Model(r, mean, dims, pq)
  }

  /** PQ-encode through the learned rotation: (idCol, code, err) with
    * err the quantization error IN the rotated space (rotation is
    * orthonormal, so it equals the reconstruction error on x̃).
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame =
    ProductQuantizer.encode(
      df.select(col(idCol),
        rotate(col(vecCol), model.rotation, model.mean, model.dims).as("__y")),
      idCol, "__y", model.pq)

  /** Solve max_R tr(R·M) over orthonormal R: SVD M = U·S·Vᵀ → R = V·Uᵀ.
    * The SVD runs through [[Pca.jacobi]] on the symmetric MᵀM (V and
    * S²), with U = M·V/S; near-zero singular directions complete U by
    * Gram–Schmidt so R stays exactly orthonormal even for rank-
    * deficient M (e.g. k-means collapsed to few distinct centroids).
    */
  private[sim] def procrustes(mMat: Array[Array[Double]]): Array[Double] = {
    val d = mMat.length
    // MᵀM (symmetric PSD)
    val mtm = Array.tabulate(d, d) { (i, j) =>
      var s = 0.0; var l = 0
      while (l < d) { s += mMat(l)(i) * mMat(l)(j); l += 1 }
      s
    }
    val (lams, vecs) = Pca.jacobi(mtm)
    val order = lams.zipWithIndex.sortBy(-_._1).map(_._2)
    // V columns (right singular vectors), descending singular value
    val v = Array.tabulate(d, d)((i, c) => vecs(i)(order(c)))
    val sv = order.map(o => math.sqrt(math.max(lams(o), 0.0)))
    val u = Array.ofDim[Double](d, d)
    // relative rank cutoff: Jacobi's "zero" eigenvalues of MᵀM come
    // back as ~1e-12·λmax, i.e. ~1e-6·s_max after the sqrt — a column
    // M·v/s built from one would be numerically garbage, so treat it
    // as deficient and complete the basis instead
    val eps = 1e-5 * math.max(1e-300, sv.headOption.getOrElse(0.0))
    var c = 0
    while (c < d) {
      if (sv(c) > eps) {
        var i = 0
        while (i < d) {
          var s = 0.0; var l = 0
          while (l < d) { s += mMat(i)(l) * v(l)(c); l += 1 }
          u(i)(c) = s / sv(c)
          i += 1
        }
      } else {
        // complete an orthonormal column from the standard basis
        var e = 0
        var done = false
        while (e < d && !done) {
          val cand = Array.tabulate(d)(i => if (i == e) 1.0 else 0.0)
          var p = 0
          while (p < c) {
            var dot = 0.0; var i = 0
            while (i < d) { dot += cand(i) * u(i)(p); i += 1 }
            i = 0
            while (i < d) { cand(i) -= dot * u(i)(p); i += 1 }
            p += 1
          }
          val nrm = math.sqrt(cand.map(x => x * x).sum)
          if (nrm > 1e-6) {
            var i = 0
            while (i < d) { u(i)(c) = cand(i) / nrm; i += 1 }
            done = true
          }
          e += 1
        }
        require(done, "Procrustes: could not complete an orthonormal basis")
      }
      c += 1
    }
    // R = V·Uᵀ, row-major
    val r = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) {
        var s = 0.0; var l = 0
        while (l < d) { s += v(i)(l) * u(j)(l); l += 1 }
        r(i * d + j) = s
        j += 1
      }
      i += 1
    }
    r
  }
}

/** (n, Σb, Σ a·bᵀ) cross-moments of two vector columns in one bounded
  * buffer of 1 + d + d² doubles — the rotation-step pass of [[Opq]].
  * Output: array<double> [n, Σb…, Σ a_i·b_j (row-major by a-index)].
  * Rows where either side is null/mis-sized are skipped, matching
  * [[CovMoments]].
  */
case class CrossMoments(
    left: Expression,
    right: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with BinaryLike[Expression] {

  require(dim > 0 && dim <= 4096, "dim must lie in [1, 4096]")

  private def isFloatType(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"cross_moments needs array<float|double>, got $t")
  }

  @transient private lazy val leftFloat = isFloatType(left)
  @transient private lazy val rightFloat = isFloatType(right)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _),
            ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cross_moments requires two array<float|double>, got ${l.sql}, ${r.sql}")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  private val size = 1 + dim + dim * dim

  override def createAggregationBuffer(): Array[Double] = new Array[Double](size)

  private def read(arr: ArrayData, isFloat: Boolean): Array[Double] = {
    if (arr.numElements() != dim) return null
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    x
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val lv = left.eval(input)
    val rv = right.eval(input)
    if (lv != null && rv != null) {
      val a = read(lv.asInstanceOf[ArrayData], leftFloat)
      val b = read(rv.asInstanceOf[ArrayData], rightFloat)
      if (a != null && b != null) {
        buf(0) += 1.0
        var i = 0
        while (i < dim) {
          buf(1 + i) += b(i)
          var j = 0
          val base = 1 + dim + i * dim
          while (j < dim) { buf(base + j) += a(i) * b(j); j += 1 }
          i += 1
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CrossMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CrossMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CrossMoments =
    copy(left = newLeft, right = newRight)
}
