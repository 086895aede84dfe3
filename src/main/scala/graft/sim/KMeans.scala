package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic Lloyd's k-means over an embedding column — the
  * clustering stage of a semantic-dedup / domain-discovery pipeline
  * (cluster first, then compare or sample only within clusters, so the
  * pairwise work scales with cluster occupancy instead of N²).
  *
  * Why this is reproducible across runs AND engines (the usual k-means
  * is neither):
  *  - init: the k corpus rows with the smallest (hash60(id), id) — a
  *    uniform pseudo-random draw with no RNG state, same trick as
  *    [[Ann.ivfTopK]]'s centroid sample.
  *  - assignment: squared-L2 computed as xx − 2·x·c + cc from
  *    left-fold dot products (bit-exact in any engine that folds
  *    left-to-right), ties broken by cluster id.
  *  - update: the mean is computed from per-dimension sums of the
  *    components QUANTIZED to integers (round(x·1e6) as long). Integer
  *    addition is exact and order-independent, so the new centroid does
  *    not depend on row order or partitioning — the one place where
  *    textbook float k-means diverges run-to-run. Safe for clusters up
  *    to ~2^43 rows at unit-range components (long overflow bound);
  *    beyond that, raise the quantization step.
  *
  * Scale shape: assignment is a SINGLE narrow stage — the trained
  * centroids are literals, so the per-row argmin over k candidates is
  * one codegen'd array_min expression, no join and no shuffle. Each
  * training iteration adds one partial-aggregated shuffle of
  * (cluster, dim) keyed integer sums whose volume is k·dim rows per map
  * partition, independent of N. The centroid state (k·dim doubles) is
  * driver-bounded, exactly like the classic MLlib implementation.
  */
object KMeans {

  /** Quantization step for the exact integer centroid update. */
  val Scale = 1000000L

  /** Trained centroids: cluster id (0..k-1, in init-draw order) →
    * components.
    */
  final case class Model(centroids: Seq[(Int, Seq[Double])])

  private def dot(a: Column, b: Column): Column =
    graft.functions.TextHashes.dot_fold(a, b)

  /** Left fold matching the engines' list_reduce order. */
  private def selfDot(v: Seq[Double]): Double =
    v.foldLeft(0.0)((acc, x) => acc + x * x)

  /** (vec_id, x, xx) projection with the vector cast to array<double>
    * and its self-dot staged once per row.
    */
  private def base(vectors: DataFrame, idCol: String, vecCol: String): DataFrame =
    graft.ops.Parallelism.widen(vectors)
      .select(col(idCol).as("vec_id"),
        col(vecCol).cast(ArrayType(DoubleType)).as("x"))
      .withColumn("xx", dot(col("x"), col("x")))

  /** `(dist2, cluster)` argmin struct of vector expression `x` (with
    * its self-dot `xx` staged by the caller) over the model's
    * centroids — the narrow codegen'd kernel shared by [[assign]] and
    * [[ProductQuantizer]]'s per-subspace encoder. Ties on dist2 break
    * to the lower cluster id.
    *
    * The centroid matrix rides the codegen context as a REFERENCE
    * OBJECT ([[graft.functions.NearestCentroidExpr]]): the earlier
    * composed form — `array_min` over k inlined
    * `struct(xx − 2·dot(x, lit(c)) + cc, cl)` candidates — blew
    * Janino's 64 KB generated-method limit once the argmin fused into
    * a wider stage (the assign→posexplode→partial-agg training stage),
    * silently dropping that stage out of whole-stage codegen. The
    * kernel reproduces the composed form's arithmetic and struct-min
    * tie semantics bit-for-bit (same left-fold dots, same
    * Double.compare ordering), so all four scale factors of strict
    * hash gates are unaffected.
    */
  private[sim] def bestOf(x: Column, xx: Column, m: Model): Column =
    graft.functions.NearestCentroid.nearest_centroid(
      x, xx,
      m.centroids.map(_._1),
      m.centroids.map(_._2),
      m.centroids.map { case (_, cv) => selfDot(cv) })

  /** Nearest-centroid assignment: (vec_id, x, cluster, dist2). Pure
    * narrow expression — see [[bestOf]].
    */
  private def assign(b: DataFrame, m: Model): DataFrame =
    b.withColumn("best", bestOf(col("x"), col("xx"), m))
      .select(col("vec_id"), col("x"),
        col("best.cluster").as("cluster"), col("best.dist2").as("dist2"))

  /** Train k centroids with `iters` Lloyd iterations. Each iteration
    * collects k·dim quantized sums to the driver (bounded model state,
    * not a data collect) and rebuilds the literal centroid expressions;
    * clusters that attract no rows keep their previous centroid.
    */
  def fit(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): Model =
    fitFrom(vectors, idCol, vecCol, k, iters, init0 = None)

  /** [[fit]] with the init draw optionally precomputed by the caller —
    * [[ProductQuantizer]] draws ONE hash-ordered sample of full
    * vectors and slices it per subspace, instead of paying the same
    * corpus sort m times (the draw depends only on ids, so the m
    * per-subspace draws select identical rows).
    */
  private[sim] def fitFrom(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, init0: Option[Seq[(Int, Seq[Double])]]): Model = {
    val b = base(vectors, idCol, vecCol).cache()
    try {
      val init = init0.getOrElse {
        val h = graft.text.TextAnalysis.hash60(col("vec_id").cast(StringType))
        b.orderBy(h.asc, col("vec_id").asc).limit(k)
          .select(col("x")).collect()
          .zipWithIndex
          .map { case (r, i) => (i, r.getSeq[Double](0)) }
          .toSeq
      }
      require(init.nonEmpty, "k-means needs a non-empty vector input")
      var model = Model(init.toIndexedSeq)
      for (_ <- 0 until iters) {
        // per-(cluster, dim) exact integer sums; partial aggregation
        // bounds the shuffle at k·dim rows per map partition
        val sums = assign(b, model)
          .select(col("cluster"), posexplode(col("x")).as(Seq("dim", "comp")))
          .groupBy(col("cluster"), col("dim"))
          .agg(sum(round(col("comp") * Scale).cast(LongType)).as("sq"),
            count(lit(1)).as("cnt"))
          .collect()
          .groupBy(_.getInt(0))
        model = Model(model.centroids.map { case (cl, old) =>
          sums.get(cl) match {
            case Some(rows) =>
              val byDim = rows.map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
              (cl, old.indices.map { d =>
                val (sq, cnt) = byDim(d)
                sq.toDouble / cnt / Scale
              })
            case None => (cl, old) // empty cluster: keep previous centroid
          }
        })
      }
      model
    } finally b.unpersist()
  }

  /** Nearest-centroid id of a raw vector COLUMN — the assignment as a
    * standalone pure expression, for callers that must keep their own
    * row shape (e.g. a watermarked stream carrying its event-time
    * column, [[graft.streaming.EventStreams.ivfAssignStream]]): no
    * projection to the (vec_id, x) frame, no join, same literal-
    * centroid argmin and tie-break as [[assignWith]]/[[assignDist]].
    */
  def clusterOf(vec: Column, m: Model): Column = {
    val x = vec.cast(ArrayType(DoubleType))
    bestOf(x, dot(x, x), m).getField("cluster")
  }

  /** Assignment that RETAINS the vector: (vec_id, x, cluster) with `x`
    * cast to array<double>. Same narrow literal-centroid argmin as
    * [[fitAssign]]; for consumers (e.g. [[SemDedup]]) that need the
    * vector downstream, keeping it here avoids a corpus-wide join back
    * to the input.
    */
  def assignWith(vectors: DataFrame, idCol: String, vecCol: String,
      m: Model): DataFrame =
    assign(base(vectors, idCol, vecCol), m)
      .select(col("vec_id"), col("x"), col("cluster"))

  /** Assign an arbitrary frame against an EXISTING model: (vec_id,
    * cluster, dist2) — the index-APPEND primitive: a delta batch
    * enters a live IVF index through one narrow literal-centroid pass,
    * no retraining and no shuffle. Same clamp-then-round discipline as
    * [[fitAssign]] (see its comment).
    */
  def assignDist(vectors: DataFrame, idCol: String, vecCol: String,
      m: Model): DataFrame =
    // clamp before rounding: xx − 2·dot + cc cancels to a TINY NEGATIVE
    // for vectors nearly coinciding with their centroid, and
    // round(-1e-10, 6) is -0.0 in some engines but +0.0 in others —
    // the one value str()-based hash gates disagree on
    assign(base(vectors, idCol, vecCol), m)
      .select(col("vec_id"), col("cluster"),
        round(greatest(col("dist2"), lit(0.0)), 6).as("dist2"))

  /** Train then assign: (vec_id, cluster, dist2). The returned plan is
    * one narrow stage over the corpus (trained centroids are literals).
    */
  def fitAssign(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    assignDist(vectors, idCol, vecCol, fit(vectors, idCol, vecCol, k, iters))
}
