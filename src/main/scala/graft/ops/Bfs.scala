package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous multi-source BFS (unit-weight shortest paths) over an
  * edge list — the reachability/radius primitive the graph family
  * ([[ConnectedComponents]], [[LabelPropagation]], [[KCore]]) was
  * missing. Curation uses: "how many hops from a trusted seed set is
  * this document's domain" as a quality prior (link-distance
  * weighting), and bounded-radius neighborhood extraction around
  * flagged items for audit sampling.
  *
  * Semantics (fixed, data-independent — the oracle unrolls the same
  * rounds): dist(v) = 0 for every seed; each synchronous round,
  * dist'(v) = min(dist(v), 1 + min over in-neighbors u of dist(u)).
  * After `rounds` rounds the frame holds exactly the vertices within
  * `rounds` hops of a seed, each with its true hop distance (unit
  * weights ⇒ round-r BFS distance IS the shortest path for any vertex
  * first reached at round ≤ r). All-integer distances + min ⇒
  * bit-identical replay in any engine.
  *
  * Scale shape: each round is one equi-join of the persisted edge list
  * against the CURRENT distance frame plus one partial-aggregated min
  * keyed by vertex — the frontier frame is at most |V| rows and only
  * ever grows by reachable vertices, never |E|-sized. Rounds are fixed,
  * so plan depth is static; lineage is cut per round with the
  * localCheckpoint discipline from [[ConnectedComponents]] (each round
  * references the previous frame twice: the keep-old branch and the
  * relax branch).
  */
object Bfs {

  /** Hop distances after `rounds` synchronous relaxations:
    * (id, dist) for every vertex within `rounds` hops of a seed.
    * `edges` are directed (src, dst); distances flow src → dst, so
    * pass a symmetrized list for undirected semantics. `seeds` is a
    * one-column (id) frame; seed rows absent from the graph still
    * appear with dist 0 (they are their own 0-hop neighborhood).
    */
  /** @param persistEdges cache+widen the edge frame for the rounds
    *   (default). Pass false when `edges` is already a materialized
    *   layout whose partitioning the rounds should SEE — e.g. a
    *   [[GraphStore]] bucketed table, where persisting would work but
    *   widening could re-partition away the bucket alignment.
    */
  def run(seeds: DataFrame, edges: DataFrame, rounds: Int = 4,
      persistEdges: Boolean = true): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // hash(src)-partitioned cache (Parallelism.hashBy): each round's
    // relax join needs ClusteredDistribution(src) — the pinned layout
    // is consumed in place every round instead of re-exchanging an
    // arbitrarily-partitioned cache per round.
    val e =
      if (persistEdges) graft.CacheRegistry.register(
        Parallelism.hashBy(edges.select(col("src"), col("dst")), col("src"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else edges.select(col("src"), col("dst"))
    // Rounds ≤ MaxUnrolledRounds run as ONE unrolled plan with no
    // per-round checkpoint+count barriers (the LabelPropagation
    // argument: each round references `dist` twice, so plan copies
    // grow 2^rounds — bounded at 64 compact subtrees for the fixed
    // rounds = 4 every caller uses — and the duplicated per-round
    // aggregations sit behind identical exchanges that AQE's stage
    // cache materializes once). Larger round counts keep the
    // ConnectedComponents truncation discipline.
    val unrolled = rounds <= LabelPropagation.MaxUnrolledRounds
    var dist = seeds.select(col("id")).distinct()
      .select(col("id"), lit(0L).as("dist"))
    if (!unrolled) {
      dist = dist.localCheckpoint(false)
      dist.count() // materializes the lazy checkpoint
    }
    for (_ <- 1 to rounds) {
      // relax: every reached vertex offers dist+1 to its out-neighbors;
      // union with the keep-old branch, then one map-side-combining min
      val relaxed = dist
        .unionByName(
          e.join(dist, e("src") === dist("id"))
            .select(col("dst").as("id"), (col("dist") + 1L).as("dist")))
        .groupBy(col("id"))
        .agg(min(col("dist")).as("dist"))
      if (unrolled) dist = relaxed
      else {
        val next = relaxed.localCheckpoint(false)
        next.count() // materializes the lazy checkpoint
        org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(dist)
        dist = next
      }
    }
    dist
  }
}
