package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate k-NN GRAPH construction — every node's top-k cosine
  * neighbors, built without an N² pass. This is the corpus-wide
  * structure the embedding-side curation stack consumes (SemDedup
  * clusters it, graph dedup walks it, hard-negative mining samples
  * from it); the per-QUERY paths in [[Ann]] answer "neighbors of
  * these few rows", this answers "neighbors of every row".
  *
  * Algorithm: NN-Descent (Dong, Moses & Li, WWW'11 — "Efficient
  * k-nearest neighbor graph construction for generic similarity
  * measures"), seeded by TWO independent sign-LSH tables instead of
  * random edges, so round 0 already has locality AND the seed graph's
  * connected components span buckets:
  *
  *  1. SEED — bucket all nodes twice, by the sign patterns of two
  *     DISJOINT sets of `numPlanes` fixed hyperplanes
  *     ([[Ann.lshKey]]); candidates are pairs sharing either bucket;
  *     keep exact-cosine top-k per node. One table is NOT enough:
  *     every seed edge then stays inside one bucket, so
  *     neighbor-of-neighbor expansion can never leave its bucket
  *     component and refinement provably cannot repair a seed miss.
  *     The second table's buckets cut across the first's, which is
  *     exactly the cross-partition connectivity descent traverses.
  *  2. REFINE ×`rounds` — a neighbor of my neighbor is likely my
  *     neighbor: expand candidates through the UNDIRECTED current
  *     graph (edges + reversed edges), union the current edges,
  *     dedup, re-score with exact cosine, keep top-k per node.
  *
  * Scale shape (the reason this survives 100 TB): the seed join fans
  * in by bucket occupancy (N·avg-occupancy pairs, never N²); each
  * refine round generates ≤ N·(2k)² + N·k candidate pairs — linear in
  * N for fixed k; every join is an equi-join on node id or bucket
  * (hash-partitioned, AQE-skew-splittable); the per-node top-k window
  * partitions by node over groups bounded by (2k)²+k rows, so no
  * reducer ever sees more than a constant number of rows per key.
  * Nothing is collected to the driver and no round materializes a
  * distance matrix.
  *
  * Determinism: hyperplanes are the fixed integer-mix constants of
  * [[Ann.hyperplane]]; dot products fold left-to-right
  * ([[Ann.dot]] — bit-identical across engines); ties break by
  * (sim desc, dst asc), a total order. The whole trajectory is
  * therefore replayable round-for-round in the DuckDB oracle.
  */
object KnnGraph {

  /** Hyperplane index offset of the second seed table — disjoint from
    * the low indices (bucketed ANN/near-dup) and from Ann.project's
    * JL block at 4096.
    */
  val SeedTableOffset = 8192

  /** Sentinel for `build`'s numPlanes: derive the plane count from the
    * corpus size so bucket occupancy stays ~constant (see
    * [[seedPlanes]]). This is the default — a STATIC plane count is
    * the codebase's one measured 100× scale-killer (sf10 probe, r15:
    * fixed 4 planes → 16 buckets → ~3.1k occupancy at 50k nodes →
    * ~3×10⁸ seed pairs → 77 GB spill, 3/3 OOM).
    */
  val DerivePlanes = 0

  /** Expected bucket occupancy the derived plane count targets: the
    * seed stage enumerates ~2·N·occupancy candidate pairs, so holding
    * occupancy constant holds the seed LINEAR in N.
    */
  val SeedTargetOccupancy = 16L

  /** Plane-count bounds: the floor keeps tiny corpora out of
    * degenerate 1-2-bucket blocking; the ceiling bounds the ORACLE's
    * expression size (the DuckDB replay computes all `SeedMaxPlanes`
    * sign terms per table and masks down — 2^20 buckets cover ~16M
    * nodes at the target occupancy; beyond that raise the ceiling,
    * the engine side is O(planes) either way).
    */
  val SeedMinPlanes = 4
  val SeedMaxPlanes = 20

  /** Occupancy-derived seed plane count: the smallest P in
    * [SeedMinPlanes, SeedMaxPlanes] with n ≤ occupancy·2^P — EXACT
    * integer comparisons (no floating log2), so the DuckDB oracle's
    * CASE chain ([[graft.queries]] knnPlanesSql) reproduces it
    * bit-for-bit at every scale factor.
    */
  def seedPlanes(n: Long, targetOcc: Long = SeedTargetOccupancy,
      minP: Int = SeedMinPlanes, maxP: Int = SeedMaxPlanes): Int = {
    require(n >= 0 && targetOcc >= 1 && minP >= 1 && maxP >= minP)
    var p = minP
    while (p < maxP && n > (targetOcc << p)) p += 1
    p
  }

  /** Build the k-NN graph over `corpus`.
    *
    * @param corpus    (idCol, vecCol) rows; idCol values unique
    * @param k         neighbors kept per node
    * @param rounds    NN-Descent refinement rounds after the LSH seed
    * @param numPlanes sign-LSH planes for the seed blocking — FEWER
    *                  planes = bigger buckets = denser seed graph.
    *                  Default [[DerivePlanes]] sizes the count from
    *                  one corpus count() (a metadata-cheap action,
    *                  the q_semdedup occupancy discipline) via
    *                  [[seedPlanes]], holding occupancy ~constant at
    *                  any SF; pass an explicit positive value only
    *                  for synthetic fixtures whose geometry needs a
    *                  pinned bucket layout
    * @param dim       vector dimension — MUST match the data: the
    *                  sign kernel maps length-mismatched vectors to
    *                  the all-zeros bucket, which silently degenerates
    *                  the seed into a full N² self-join, so EVERY
    *                  row's length is validated inside the same
    *                  projection that computes the bucket keys (a
    *                  codegen'd size() branch — free next to the dot
    *                  folds; the former 1-row collect probe launched
    *                  an extra Spark job per build() call and a
    *                  mixed-dimension corpus could still slip past
    *                  its single sampled row)
    * @return (src, dst, sim, rank) — top-k ranked neighbors per node;
    *         sim rounded to 6dp at the end only (full-precision
    *         doubles order every intermediate round)
    */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 3, rounds: Int = 2, numPlanes: Int = DerivePlanes,
      dim: Int = 64): DataFrame = {
    require(k >= 1 && rounds >= 0 && numPlanes >= 0 && dim >= 1)
    val planeCount =
      if (numPlanes == DerivePlanes) seedPlanes(corpus.count())
      else numPlanes
    // per-row dim guard, evaluated where the bucket keys are computed:
    // a mismatched vector raises with its actual length instead of
    // quietly landing in the all-zeros bucket
    val guardedVec = when(size(col(vecCol)) === dim, col(vecCol))
      .otherwise(raise_error(concat(
        lit(s"KnnGraph.build(dim = $dim) on a "), size(col(vecCol)),
        lit("-dim vector: the LSH seed would silently degenerate" +
          " to an N^2 self-join"))))
    val planes1 = (0 until planeCount).map(i => Ann.hyperplane(i, dim))
    val planes2 = (0 until planeCount)
      .map(i => Ann.hyperplane(SeedTableOffset + i, dim))
    // transient caches (released by CacheRegistry after the query):
    // `keyed` is referenced by both bucket sides of the seed and by
    // the per-round vector join-backs; each round's graph is
    // referenced three times by the next round (both undirected
    // directions + the keep-current union) and the caller may
    // self-join the result — without the per-round pin the lineage
    // re-executes the whole descent ~3^rounds times
    def pin(df: DataFrame): DataFrame = graft.CacheRegistry.register(
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // one staged frame: id, vec, norm (computed once per NODE, not per
    // pair — the cosinePre discipline). Persisted hash(id) at pinned
    // shuffle width (Parallelism.hashBy): the id-keyed vector
    // join-backs (2 per round + 2 at seed) then consume the cached
    // layout in place instead of re-exchanging the vector payload per
    // join — guide §2.3's "move keys, not payloads" applied to the
    // descent's heaviest column. The hash exchange doubles as the
    // parallelism widener for the narrow parquet input; the
    // norm/bucket projections run AFTER it, on every core.
    val keyed = pin(graft.ops.Parallelism.hashBy(
        corpus.select(col(idCol).as("id"), guardedVec.as("vec")), col("id"))
      .withColumn("nrm", Ann.norm(col("vec")))
      .withColumn("b1", Ann.lshKey(col("vec"), planes1))
      .withColumn("b2", Ann.lshKey(col("vec"), planes2)))
    val srcSide = keyed.select(col("id").as("src"), col("vec").as("svec"),
      col("nrm").as("sn"))
    val dstSide = keyed.select(col("id").as("dst"), col("vec").as("dvec"),
      col("nrm").as("dn"))

    def topK(scored: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("src"))
        .orderBy(col("sim").desc, col("dst").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
    }

    // seed: pairs sharing either table's bucket (dedup'd — a pair can
    // match in both tables), then exact cosine, top-k per node
    def bucketPairs(b: String) = keyed
      .select(col(b).as("bk"), col("id").as("src"))
      .join(keyed.select(col(b).as("bk"), col("id").as("dst")), Seq("bk"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
    val seedCand = bucketPairs("b1").union(bucketPairs("b2")).distinct()
    val seedPairs = seedCand
      .join(srcSide, Seq("src"))
      .join(dstSide, Seq("dst"))
      .select(col("src"), col("dst"),
        Ann.cosinePre(Ann.dot(col("svec"), col("dvec")),
          col("sn"), col("dn")).as("sim"))
    var g = pin(topK(seedPairs))

    (1 to rounds).foreach { _ =>
      val edges = g.select(col("src"), col("dst"))
      // undirected view: NN-Descent expands through neighbors AND
      // reverse neighbors — both directions carry locality
      val und = edges.union(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      val expanded = und.as("a")
        .join(und.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .filter(col("src") =!= col("dst"))
      // keep current edges in the pool so quality is monotone: the new
      // top-k picks from (old edges ∪ expansions), never loses ground
      val cand = expanded.union(edges).distinct()
      val scored = cand
        .join(srcSide, Seq("src"))
        .join(dstSide, Seq("dst"))
        .select(col("src"), col("dst"),
          Ann.cosinePre(Ann.dot(col("svec"), col("dvec")),
            col("sn"), col("dn")).as("sim"))
      g = pin(topK(scored))
    }
    g.select(col("src"), col("dst"), round(col("sim"), 6).as("sim"),
      col("rank"))
  }

  /** Recall@k of `approx` against the exact graph `exact` — both
    * (src, dst[, …]) edge lists. One hash join + two bounded aggs.
    */
  def recall(approx: DataFrame, exact: DataFrame): Double = {
    val hit = exact.select(col("src"), col("dst"))
      .join(approx.select(col("src"), col("dst")), Seq("src", "dst"),
        "left_semi")
    val n = exact.count()
    if (n == 0L) 1.0 else hit.count().toDouble / n
  }
}
