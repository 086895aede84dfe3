package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round k-core peeling over an undirected edge list — the
  * density filter of graph-shaped curation: the k-core is the maximal
  * subgraph where every vertex keeps degree ≥ k after all lower-degree
  * vertices are (repeatedly) removed. On an interaction graph it
  * separates entities embedded in a dense neighborhood from ones whose
  * apparent degree comes only from soon-to-be-peeled fringe — a
  * structural quality gate the raw degree cannot express.
  *
  * Semantics (fixed rounds, data-independent — oracle-unrollable):
  * alive₀ = all vertices; each round, degᵣ(v) = #edges with BOTH
  * endpoints alive, aliveᵣ = {v : degᵣ(v) ≥ k}. After `rounds` rounds
  * the result reports each surviving vertex with its residual degree
  * plus a `converged` flag (aliveᵣ == aliveᵣ₋₁ by count — peeling is
  * monotone decreasing, so equal counts ⇒ the fixpoint, i.e. the true
  * k-core; false means more peeling remained and the caller should
  * re-run with more rounds). Counting-based convergence mirrors the
  * sum-based fixpoint test in [[ConnectedComponents]].
  *
  * Scale shape: each round is two semi-join-shaped equi-joins of the
  * persisted edge list against the (shrinking) alive set plus one
  * partial-aggregated degree count — all keyed shuffles, no windows,
  * no driver-side data beyond one count per round embedded in the
  * plan-free flag aggregate. Rounds are fixed; the alive frame only
  * shrinks, so later rounds get cheaper, and AQE right-sizes each.
  */
object KCore {

  /** Surviving vertices after `rounds` peels: (id, deg, converged).
    * `edges` must be symmetrized (both directions present) for
    * undirected semantics; self-loops should be pre-filtered.
    */
  def run(nodes: DataFrame, edges: DataFrame, k: Int,
      rounds: Int = 4): DataFrame = {
    require(k >= 1 && rounds >= 1, s"k=$k rounds=$rounds must be >= 1")
    // Persist the edge list hash-partitioned by dst (not round-robin
    // widened): the alive-dst semi join then consumes the cache in
    // place every round, and re-ordering the alive-src check to run on
    // the V-sized DEGREE frame (instead of the E-sized edge frame)
    // drops the per-round E-sized exchanges from two to one
    // partial-aggregated one. Equivalence: counting per src over
    // dst-alive edges and THEN keeping alive srcs counts exactly the
    // edges with both endpoints alive — a dead src's count is built
    // and discarded, never emitted; an alive src with no surviving
    // edges has no row either way.
    val e = graft.CacheRegistry.register(
      Parallelism.hashBy(edges.select(col("src"), col("dst")), col("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    def degIn(alive: DataFrame): DataFrame = e
      .join(alive.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("deg"))
      .join(alive.select(col("id")), Seq("id"), "left_semi")

    // Each round references the previous alive frame TWICE (both semi
    // joins), so raw lineage doubles per round — 2^rounds plan copies
    // by the end (observed as megabyte plan strings at rounds=4 on toy
    // graphs). The ConnectedComponents discipline applies: lazily
    // localCheckpoint each round, materialize it with the count the
    // convergence flag needs anyway, and free the superseded round's
    // blocks immediately.
    var alive = nodes.select(col("id")).localCheckpoint(false)
    var prevCount = alive.count()
    var lastCount = prevCount
    for (_ <- 1 to rounds) {
      // degree restricted to the alive-induced subgraph: two semi
      // joins keep only edges whose BOTH endpoints survive
      val next = degIn(alive).filter(col("deg") >= k).select(col("id"))
        .localCheckpoint(false)
      prevCount = lastCount
      lastCount = next.count() // materializes the lazy checkpoint
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(alive)
      alive = next
    }
    // residual degree within the surviving subgraph — NOT re-filtered
    // by k (that would be a silent extra peel round); a vertex whose
    // neighbors were all peeled in the final round reports deg 0.
    // `alive` is checkpointed, so its two appearances here are cheap.
    val finalDeg = alive
      .join(degIn(alive), Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"))
    // fixpoint flag: peeling is monotone decreasing, so an unchanged
    // alive count across the last round ⇒ nothing moved ⇒ the true
    // k-core. Counts were taken as each round materialized.
    finalDeg.withColumn("converged", lit(lastCount == prevCount))
  }
}
