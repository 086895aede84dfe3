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

  /** Build the k-NN graph over `corpus`.
    *
    * @param corpus    (idCol, vecCol) rows; idCol values unique
    * @param k         neighbors kept per node
    * @param rounds    NN-Descent refinement rounds after the LSH seed
    * @param numPlanes sign-LSH planes for the seed blocking — FEWER
    *                  planes = bigger buckets = denser seed graph;
    *                  4 (16 buckets) suits 10³–10⁵-node graphs, scale
    *                  up with corpus size to hold occupancy constant
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
      k: Int = 3, rounds: Int = 2, numPlanes: Int = 4,
      dim: Int = 64): DataFrame = {
    require(k >= 1 && rounds >= 0 && numPlanes >= 1 && dim >= 1)
    // per-row dim guard, evaluated where the bucket keys are computed:
    // a mismatched vector raises with its actual length instead of
    // quietly landing in the all-zeros bucket
    val guardedVec = when(size(col(vecCol)) === dim, col(vecCol))
      .otherwise(raise_error(concat(
        lit(s"KnnGraph.build(dim = $dim) on a "), size(col(vecCol)),
        lit("-dim vector: the LSH seed would silently degenerate" +
          " to an N^2 self-join"))))
    val planes1 = (0 until numPlanes).map(i => Ann.hyperplane(i, dim))
    val planes2 = (0 until numPlanes)
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
    // pair — the cosinePre discipline), both seed buckets
    val keyed = pin(graft.ops.Parallelism.widen(corpus)
      .select(col(idCol).as("id"), guardedVec.as("vec"))
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
