package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (community detection) over an edge
  * list — the graph-clustering complement to [[ConnectedComponents]]:
  * CC answers "which docs are transitively LINKED", LPA answers "which
  * docs cluster DENSELY" (a near-dup graph component can chain together
  * two genuinely distinct communities through one bridge pair; LPA
  * splits them, CC cannot). In a curation pipeline the community id is
  * a grouping key for per-community caps/sampling exactly like the
  * eTLD+1 domain key, but derived from interaction structure instead of
  * metadata.
  *
  * Semantics (fixed, data-independent — the oracle unrolls the same
  * rounds): every vertex starts labeled with its own id; each round,
  * synchronously, label'(v) = the label with the highest vote count
  * over {v} ∪ N(v) (self vote included — it damps the 2-cycle
  * oscillation synchronous LPA exhibits on bipartite graphs), ties
  * broken toward the SMALLEST label. All-integer votes + total
  * tie-break ⇒ bit-identical results in any engine, unlike async LPA
  * whose answer depends on visit order.
  *
  * Scale shape: each round is (a) one equi-join of the persisted edge
  * list against the label frame keyed by src, (b) one partial-
  * aggregated count keyed by (dst, label), (c) one partial-aggregated
  * lexicographic struct-max keyed by dst — NO per-vertex window sort:
  * argmax_{(count desc, label asc)} is max(struct(count, -label)),
  * which combines map-side like any max. Rounds are fixed (default 4),
  * so plan depth is static; at rounds ≳ 20 add the localCheckpoint
  * discipline from [[ConnectedComponents]].
  */
object LabelPropagation {

  /** Rounds up to which the loop stays a single unrolled plan (no
    * per-round lineage truncation): plan copies grow 2^rounds, so 6
    * bounds the analyzed tree at 64 compact subtree copies while every
    * production caller (rounds = 4) gets the barrier-free path.
    */
  val MaxUnrolledRounds = 6

  /** Labels after `rounds` synchronous votes: (id, community).
    * `edges` are directed (src, dst) as stored; votes flow src → dst,
    * so pass a symmetrized list for undirected semantics. Vertices
    * absent from any dst side keep their previous (initial) label.
    *
    * `nodes.id` MUST be distinct (every caller passes a vertex-set
    * frame). The invariant is load-bearing (ADVICE r16): the
    * picked-covers-v identity that lets each round skip the v
    * left-join holds because every v row self-votes exactly once —
    * with duplicate ids the old per-round re-join duplicated output
    * rows while `picked` (a groupBy) dedups from round 1. Asserting
    * distinctness with a count here would cost an extra job per call;
    * documenting it keeps the contract explicit at zero cost.
    */
  def run(nodes: DataFrame, edges: DataFrame, rounds: Int = 4): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // Persist the edge list HASH-PARTITIONED BY src, not round-robin
    // widened: every round's vote join needs ClusteredDistribution(src),
    // so a round-robin cache re-exchanges the E-sized frame once per
    // round while a hash(src) cache is consumed in place all `rounds`
    // times (one E-shuffle at build, zero after — the GraphStore
    // "edges arrive pre-hashed" economics, which widen() was silently
    // discarding for this operator). The label frame side is also free:
    // groupBy/checkpoint keeps labels hash-partitioned on id, and
    // LogicalRDD preserves partitioning (see Bridge.checkpointWithStats),
    // so steady-state rounds exchange only the vote traffic.
    // Parallelism.hashBy pins the width to spark.sql.shuffle.partitions
    // (the scale-adaptive knob) so AQE cannot coalesce the cached frame
    // below the parallelism the rounds need.
    val v = graft.CacheRegistry.register(
      nodes.select(col("id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // Edges are pre-filtered ONCE to dst ∈ nodes: a vote to an
    // out-of-universe dst only ever produced a `picked` row that the
    // former per-round left-join against v discarded, so dropping the
    // edge up front is exactly equivalent — and it turns that
    // per-round V-sized join into a no-op that can be removed outright
    // (see below). In-universe votes are untouched, and the self-vote
    // branch keeps every vertex labeled, so `picked`'s key set is
    // exactly v each round.
    val e = graft.CacheRegistry.register(
      Parallelism.hashBy(
        edges.select(col("src"), col("dst"))
          .join(v.select(col("id").as("dst")), Seq("dst"), "left_semi"),
        col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // Each round references the previous label frame TWICE (self-vote
    // union branch + the neighbor join), so raw lineage doubles per
    // round — 2^rounds plan copies. At the FIXED small round counts
    // every caller uses (4), that is ≤ 2^6 copies of a compact subtree
    // whose leaves are the two caches above — cheap to analyze — and
    // the duplicated per-round aggregation subtrees all sit behind
    // IDENTICAL exchanges, which AQE's stage cache (and the
    // ReuseExchange rule without AQE) materializes ONCE per round. The
    // whole propagation then runs as a SINGLE job at the consumer's
    // action, with zero per-round driver barriers — the r16-measured
    // per-round localCheckpoint+count discipline cost ~4 sequential
    // materialization round-trips per query (checkpoint serialization
    // of a V-sized frame each) purely to truncate lineage that this
    // unrolled form never lets grow past 2^rounds. Beyond
    // MaxUnrolledRounds the ConnectedComponents checkpoint discipline
    // takes over: lazily localCheckpoint each round, materialize with
    // one tiny count, free the superseded round's blocks immediately.
    val unrolled = rounds <= MaxUnrolledRounds
    var labels = v.select(col("id"), col("id").as("lbl"))
    if (!unrolled) {
      labels = labels.localCheckpoint(false)
      labels.count() // materializes the lazy checkpoint
    }
    for (_ <- 1 to rounds) {
      // self vote rides a union with the neighbor votes so one count
      // aggregation sees both; the struct-max then picks the winner
      // with (count desc, label asc) total order, no window needed
      val votes = labels.select(col("id").as("vid"), col("lbl"))
        .unionByName(
          e.join(labels, e("src") === labels("id"))
            .select(col("dst").as("vid"), col("lbl")))
        .groupBy(col("vid"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      val picked = votes
        .groupBy(col("vid"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("w"))
        .select(col("vid").as("id"), (-col("w.nl")).as("lbl"))
      // `picked` covers exactly v: every labels row self-votes (labels
      // keys = v by induction) and the dst-side semi filter above
      // keeps foreign vids out — so the former per-round
      // v-left-join + coalesce was an identity and is gone (one join
      // and its broadcast-build job per round saved).
      if (unrolled) labels = picked
      else {
        val next = picked.localCheckpoint(false)
        next.count() // materializes the lazy checkpoint
        org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(labels)
        labels = next
      }
    }
    labels.select(col("id"), col("lbl").as("community"))
  }

  /** run() + per-community member counts: (id, community, csize). */
  def withSizes(nodes: DataFrame, edges: DataFrame,
      rounds: Int = 4): DataFrame = {
    val labeled = run(nodes, edges, rounds)
    val sizes = labeled.groupBy(col("community")).agg(count(lit(1)).as("csize"))
    labeled.join(sizes, Seq("community"))
      .select(col("id"), col("community"), col("csize"))
  }
}
