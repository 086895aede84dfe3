package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small)
  *    query set against the corpus; one narrow map + per-query top-k
  *    via window rank. The right baseline at any corpus size as long as
  *    the QUERY side is small (it is broadcast).
  *  - [[lshBucketTopK]]: sign-random-projection LSH — corpus and
  *    queries are bucketed by the sign pattern of h fixed hyperplanes;
  *    candidates are only same-bucket rows, so the join scales with
  *    bucket occupancy instead of |corpus|×|queries|. Recall < 1 by
  *    construction; probe multiple bucket groups to trade compute for
  *    recall.
  *
  * Dot products fold left-to-right over the array (functions.aggregate)
  * so float math is order-deterministic and reproducible across runs
  * and engines.
  */
object Ann {

  /** Left-to-right dot product of two array<float|double> columns in
    * double — the native codegen'd fold (graft.functions.DotFold):
    * bit-identical to aggregate(zip_with(a,b,(x,y)->double·double)),
    * 0.0, +) at a fraction of the cost (higher-order functions run
    * their lambdas interpreted).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.TextHashes.dot_fold(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Cosine from PRE-COMPUTED norms. The array folds run interpreted
    * (higher-order functions have no codegen), so recomputing both
    * norms per candidate PAIR triples the hot-path fold work; staging
    * `norm(v)` once per row and passing it here is bit-identical (same
    * operands, same fold order) at a third of the cost.
    */
  def cosinePre(dotAB: Column, normA: Column, normB: Column): Column = {
    val d = normA * normB
    when(d > 0, dotAB / d).otherwise(lit(0.0))
  }

  /** Exact top-k neighbors for each query row.
    * @param corpus  (idCol, vecCol) rows
    * @param queries small DataFrame of (idCol, vecCol) query rows —
    *                broadcast; keep it ≤ a few thousand rows
    * @param excludeSelfId drop candidates whose id equals the query
    *                id — correct for self-search (queries ⊆ corpus),
    *                WRONG when queries and corpus are two different
    *                collections with independent id spaces (bitext
    *                mining: x₇'s true partner y₇ would be
    *                unreachable); those callers pass false
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelfId: Boolean = true): DataFrame = {
    // norms staged in projections BELOW the join: computed once per
    // row, not once per (query, candidate) pair — Project does not
    // collapse across a Join, so Catalyst cannot re-inline them
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      norm(col(vecCol)).as("qn"))
    val c = graft.ops.Parallelism.widen(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
        norm(col(vecCol)).as("cn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .filter(!lit(excludeSelfId) ||
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(dot(col("qvec"), col("cvec")), col("qn"), col("cn")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("sim", round(col("sim"), 6))
  }

  /** Deterministic pseudo-random hyperplanes: component j of plane i is
    * derived from a fixed integer mix — no RNG state, same planes on
    * every executor and every engine.
    */
  def hyperplane(i: Int, dim: Int): Seq[Double] =
    (0 until dim).map { j =>
      val x = (i * 2654435761L + j * 40503L + 17L) % 1009L
      (x.toDouble / 1009.0) * 2.0 - 1.0
    }

  /** Johnson-Lindenstrauss random projection to `outDim` dimensions:
    * y_j = ⟨x, plane_j⟩ / √outDim over `outDim` deterministic
    * hyperplanes drawn at `seedOffset` (keep offsets disjoint from the
    * LSH/near-dup plane indices so the projection is independent of
    * the bucketing). Distance-preserving in expectation (JL lemma), so
    * downstream cosine/L2 work runs on outDim ≪ dim components — the
    * standard preprocessing when 100 TB of embeddings make full-width
    * distance math the bottleneck. Pure narrow expression: no shuffle,
    * no state, projects in one codegen'd map over the corpus.
    */
  def project(vec: Column, outDim: Int, dim: Int = 64,
      seedOffset: Int = 4096): Column = {
    require(outDim >= 1)
    val s = math.sqrt(outDim.toDouble)
    array((0 until outDim).map { j =>
      dot(vec, typedLit(hyperplane(seedOffset + j, dim))) / s
    }: _*)
  }

  /** Sign-pattern bucket key over h hyperplanes — one SignBuckets
    * kernel call (plan stays O(1) in h·dim; the old per-plane
    * when(dot(vec, array(lit…)) >= 0, …) chain inlined h·dim literal
    * nodes). Null vector degrades to the all-zeros key, exactly like
    * the composed chain.
    */
  def lshKey(vec: Column, planes: Seq[Seq[Double]]): Column =
    element_at(
      graft.functions.TextHashes.sign_buckets(vec, planes, 1, withPrefix = false), 1)

  /** IVF-Flat approximate top-k — the inverted-file scale path: the
    * corpus is PARTITIONED into `nlist` cells (each vector assigned to
    * its nearest centroid), and a query searches only the `nprobe`
    * cells whose centroids are nearest to it, touching
    * ~`nprobe/nlist` of the corpus instead of all of it.
    *
    * Centroids are SAMPLED deterministically rather than
    * k-means-trained — training is an offline concern; the
    * partition/probe machinery, which is what an engine provides, is
    * identical and fully reproducible. The sample is the `nlist`
    * corpus rows with the smallest (hash60(id), id) — a uniform
    * pseudo-random draw that is agnostic to the id distribution (ids
    * may be sparse, offset, or arbitrarily typed; the old
    * `id < nlist` pick silently returned fewer/no centroids for
    * non-zero-based ids). All similarity math is the left-fold dot
    * product (bit-exact across engines), ties broken by centroid id /
    * neighbor id. Pick nlist ≈ √N so cells hold ~√N vectors each
    * (see SCALE.md).
    *
    * Scale shape: centroid table is broadcast twice (corpus assignment
    * and query probing are narrow map stages over `nlist` candidates);
    * the only shuffle is the candidate join on cell id, whose fan-in
    * per query is bounded by the probed cells' occupancy.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cent = corpus
      // deterministic hash-ordered sample: sort+limit plans as
      // TakeOrderedAndProject (no full sort materialization)
      .orderBy(graft.text.TextAnalysis.hash60(col(idCol).cast(StringType)).asc,
        col(idCol).asc)
      .limit(nlist)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"),
        norm(col(vecCol)).as("cvn"))
    // row norms staged below each crossJoin (computed once per row, not
    // once per centroid candidate); the per-pair work is one dot fold
    def nearestCells(df: DataFrame, outId: String, outVec: String,
        outNorm: String, keep: Int) = {
      val w = Window.partitionBy(col(outId))
        .orderBy(col("csim").desc, col("cid").asc)
      df.crossJoin(broadcast(cent))
        .select(col(outId), col(outVec), col(outNorm), col("cid"),
          cosinePre(dot(col(outVec), col("cv")), col(outNorm), col("cvn"))
            .as("csim"))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= keep)
        .drop("csim", "r")
    }
    val asg = nearestCells(
      graft.ops.Parallelism.widen(corpus)
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
          norm(col(vecCol)).as("cn")),
      "neighbor_id", "cvec", "cn", keep = 1)
    val probe = nearestCells(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        norm(col(vecCol)).as("qn")),
      "query_id", "qvec", "qn", keep = nprobe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    asg.join(probe, Seq("cid"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(dot(col("qvec"), col("cvec")), col("qn"), col("cn")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("sim", round(col("sim"), 6))
  }

  /** Approximate top-k: candidates restricted to rows sharing the
    * query's LSH bucket, then exact cosine rank within the bucket.
    */
  def lshBucketTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, numPlanes: Int = 8): DataFrame = {
    val dim = 64
    val planes = (0 until numPlanes).map(i => hyperplane(i, dim))
    val c = graft.ops.Parallelism.widen(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
        lshKey(col(vecCol), planes).as("bucket"),
        norm(col(vecCol)).as("cn"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      lshKey(col(vecCol), planes).as("bucket"),
      norm(col(vecCol)).as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(dot(col("qvec"), col("cvec")), col("qn"), col("cn")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("sim", round(col("sim"), 6))
  }

  /** The query's own bucket key plus the `h` keys at Hamming
    * distance 1 (each sign bit flipped once) — the multi-probe set.
    * Distinct by construction unless flips collide (h = 0 edge), so
    * a (query, neighbor) pair joins through at most ONE probe key —
    * no dedup pass needed downstream.
    */
  private def multiProbeKeys(key: Column, h: Int): Column =
    array_distinct(concat(array(key),
      transform(sequence(lit(1), lit(h)), i =>
        concat(key.substr(lit(1), i - 1),
          when(key.substr(i, lit(1)) === "1", lit("0")).otherwise(lit("1")),
          key.substr(i + 1, lit(h))))))

  /** Multi-probe LSH top-k (Lv et al.): each query searches its own
    * sign bucket PLUS the `numPlanes` buckets one bit-flip away —
    * the standard recall repair for sign-LSH without adding hash
    * tables (more tables multiply the CORPUS index size; multi-probe
    * multiplies only the query's probe count, and the query side is
    * the small broadcast side). Candidate volume grows ≤ (h+1)× over
    * [[lshBucketTopK]] and the candidate set is a strict superset, so
    * per-query recall is monotonically ≥ the single-bucket path.
    *
    * Scale shape: identical to [[lshBucketTopK]] — the corpus is
    * keyed once (narrow kernel map, no index rebuild), the probe
    * explosion happens on the broadcast query side only, and the join
    * fan-in stays bounded by bucket occupancy.
    */
  def lshMultiProbeTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, numPlanes: Int = 8): DataFrame = {
    val dim = 64
    val planes = (0 until numPlanes).map(i => hyperplane(i, dim))
    val c = graft.ops.Parallelism.widen(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
        lshKey(col(vecCol), planes).as("bucket"),
        norm(col(vecCol)).as("cn"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
        explode(multiProbeKeys(lshKey(col(vecCol), planes), numPlanes))
          .as("bucket"),
        norm(col(vecCol)).as("qn"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosinePre(dot(col("qvec"), col("cvec")), col("qn"), col("cn")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .withColumn("sim", round(col("sim"), 6))
  }
}
