package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components over an edge list — the transitive-
  * closure step that turns near-duplicate PAIRS into duplicate CLUSTERS
  * (a corpus-scale dedup pipeline keeps one representative per
  * component, not per pair: pair-wise greedy dropping misses documents
  * linked only through intermediates).
  *
  * Algorithm: iterative min-label propagation with pointer jumping.
  * Every vertex starts labeled with min(itself, its neighbors) — the
  * first propagation folded into the same shuffle that enumerates the
  * vertex set; each round it then takes the minimum label over itself
  * and its neighbors (one join + one min-aggregation over the union
  * with the self rows), and compresses paths by re-reading its new
  * label's label in the previous round's table (one join against the
  * already-materialized frame). Pointer jumping halves label-tree depth
  * per round, so convergence takes O(log diameter) rounds, not
  * O(diameter) — the difference between 5 and 5,000 rounds on a
  * chain-shaped component.
  *
  * Scale shape: per round, one shuffle join of edges against labels,
  * one min-aggregation, and one propagated-to-labels jump join — all
  * keyed shuffles AQE can size; no driver-side data beyond a two-long
  * convergence aggregate per round. Each round's label frame is
  * localCheckpoint-ed (lazily — the convergence aggregate is the
  * materializing action, so a round runs exactly one job): without
  * lineage truncation the logical plan doubles per round (observed: a 400 MB plan string by round 8 —
  * analysis cost, not data, becomes the bottleneck); with it, every
  * round analyzes a constant-size plan over the previous round's RDD.
  * Superseded rounds' checkpoint storage is unpersisted explicitly as
  * soon as the next round materializes — waiting for the
  * ContextCleaner means waiting for a JVM GC a long-lived session may
  * not run, and the dead frames' blocks otherwise stack up across a
  * whole query suite. localCheckpoint trades off executor-
  * loss recovery for speed — acceptable here because the loop re-runs
  * from the (persisted) edge list on failure, the same caveat the
  * NASS pipeline documents at its materialization points.
  *
  * Convergence detection without comparing frames: labels never
  * increase (both steps take minima), so sum(label) is strictly
  * decreasing until the fixpoint — the loop stops when the sum repeats,
  * which is exactly "no label changed". The check sums ids as
  * DECIMAL(38,0), so it cannot overflow for any id space.
  */
object ConnectedComponents {

  /** The iterative loop runs ONLY over edge-incident vertices: in a
    * dedup corpus the near-dup subgraph is orders of magnitude smaller
    * than the vertex set, and every round's shuffles should be sized by
    * the former. Vertices with no edges never change label, so they are
    * attached as singleton components with ONE left join after the
    * fixpoint instead of riding every round.
    *
    * @param vertices one column `idCol`, one row per vertex (vertices
    *                 with no edges come out as their own singleton
    *                 component)
    * @param edges    columns `srcCol`, `dstCol`; undirected (symmetrized
    *                 internally), self-loops and duplicates tolerated;
    *                 endpoints must appear in `vertices`
    * @param maxRounds hard bound on propagation rounds — O(log diameter)
    *                 needed, so the default 30 covers any graph whose
    *                 label trees fit in memory at all; exceeded ⇒
    *                 IllegalStateException rather than silently-partial
    *                 components
    * @return (idCol, component) — component = min vertex id reachable
    */
  def run(vertices: DataFrame, edges: DataFrame, idCol: String = "id",
      srcCol: String = "src", dstCol: String = "dst",
      maxRounds: Int = 30): DataFrame = {
    val spark = vertices.sparkSession
    // LOCAL CHECKPOINT, not persist: the loop references this frame
    // every round, and a persist relies on the cache-manager plan
    // match, which the AQE/checkpoint mix inside the loop defeats —
    // measured on q_mutual_knn (492 edges derived from the NN-Descent
    // self-join): persist → every round re-derived the full edge
    // lineage, ~9 s/round; checkpoint → 0.4 s/round. The checkpoint
    // stores the same bounded edge list the persist would (lazy — the
    // seeding aggregate materializes it), with lineage truncated so
    // reuse is structural instead of best-effort.
    // The distinct runs ON a hash(src) exchange: HashPartitioning(src)
    // satisfies the (src, dst) dedup's clustering, and the checkpoint
    // then freezes a src-partitioned edge list every round's
    // propagation join consumes in place — same exchange count at
    // build (the distinct needed one anyway), zero per-round ones on
    // the E-sized side. Deliberately NOT width-pinned (bare
    // repartition(col), which AQE may coalesce): CC feeds on PAIR
    // frames that are often tiny (q_mutual_knn: 492 mutual edges) and
    // a pinned 32-wide layout costs more per-round task overhead than
    // the saved exchange — AQE right-sizes the layout to the frame,
    // and at scale the coalesced width converges to the shuffle width
    // anyway.
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .filter(col("src") =!= col("dst"))
      .repartition(col("src"))
      .distinct()
      .localCheckpoint(false)

    // overflow-proof fixpoint metric (sum of labels as decimal(38,0))
    // + the row count that prices the frame's honest stats below
    def labelSum(df: DataFrame): (Any, Long) = {
      val r = df.agg(sum(col("component").cast("decimal(38,0)")),
        count(lit(1))).head()
      (r.get(0), r.getLong(1))
    }
    // Honest per-round stats: ~3 longs of width per (id, component)
    // row. Without this clamp the checkpoint's stats rewrite SQUARES
    // sizeInBytes every round (join stats = product of children), so
    // the BigInt's bit length doubles per iteration and past ~25
    // rounds the size-only stats visitor burns MINUTES of
    // single-threaded BigInteger multiplication per round (measured:
    // q_mutual_knn wedged 45 min in Toom-Cook under
    // SizeInBytesOnlyStatsPlanVisitor) — see
    // Bridge.checkpointWithStats.
    def clamp(df: DataFrame, rows: Long): DataFrame =
      org.apache.spark.sql.graftbridge.Bridge.checkpointWithStats(
        df, BigInt(rows.max(1L)) * 48)

    // sym carries both directions, so src alone covers every endpoint.
    // Seeding with min(v, min(N(v))) — computed in the SAME shuffle
    // that enumerates the vertex set — bakes the first neighbor-min
    // propagation into initialization, saving one full loop round
    // versus the identity labeling.
    var labels = sym.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("mind"))
      .select(col("id"), least(col("id"), col("mind")).as("component"))
      .localCheckpoint(false)
    val (s0, nRows) = labelSum(labels) // materializes the lazy checkpoint
    var prevSum = s0
    labels = clamp(labels, nRows)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // neighbor-min propagation: component'(v) = min over {v} ∪ N(v).
      // One union + one min-aggregation — the self row rides the union,
      // so no separate left join is needed to keep isolated-in-frontier
      // vertices labeled.
      // the self branch re-aliases its columns so the two union children
      // don't share attribute ids (labels feeds both sides; duplicate
      // ids across union branches break constraint propagation)
      val propagated = labels
        .select(col("id").as("id"), col("component").as("component"))
        .unionByName(
          sym.join(labels, sym("src") === labels("id"))
            .select(col("dst").as("id"), col("component")))
        .groupBy(col("id"))
        .agg(min(col("component")).as("component"))
      // pointer jumping through the PREVIOUS round's labels:
      // component'(v) = min(prop(v), labels(prop(v))). Jumping through
      // `labels` instead of `propagated` keeps the same fixpoint (all
      // values are vertex ids of the same component and labels are
      // non-increasing, so the combined operator is still monotone with
      // label-prop's fixpoint) while referencing `propagated` ONCE —
      // a self-join on the uncached frame would recompute the whole
      // propagation a second time every round.
      // LAZY localCheckpoint: the labelSum action right below is the
      // materializer, so each round runs exactly one job; lineage is
      // still truncated before the next round reads the frame.
      val jumped = propagated.as("l")
        .join(labels.select(col("id").as("jid"),
          col("component").as("jcomponent")).as("j"),
          col("l.component") === col("j.jid"), "left")
        .select(col("l.id").as("id"),
          least(col("l.component"),
            coalesce(col("jcomponent"), col("l.component")))
            .as("component"))
        .localCheckpoint(false)
      // one tiny driver-side aggregate per round detects the fixpoint
      // (labels are non-increasing, so an unchanged sum means no label
      // moved) — and, being the first action, materializes the
      // checkpoint
      val (s, _) = labelSum(jumped)
      converged = s == prevSum
      prevSum = s
      // the superseded round's checkpoint blocks are dead the moment
      // `jumped` is materialized (nothing references them again) —
      // free them NOW rather than waiting for ContextCleaner + a JVM
      // GC that a long-lived session may not run for hours; without
      // this, suite-length sessions accumulate one dead label frame
      // per round per query in the block manager. The FINAL frame is
      // never unpersisted here: the returned plan still reads it.
      org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(labels)
      labels = clamp(jumped, nRows)
      round += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"[cc] round $round done at ${System.nanoTime()}")
    }
    // the edge list's checkpoint blocks are dead once the loop exits:
    // the final labels frame is itself checkpointed and materialized
    // (by its round's labelSum), so neither the return plan nor any
    // later reader re-reads sym — release it here exactly like the
    // superseded per-round label frames, or one edge list per run()
    // call leaks in the block manager for the session lifetime
    org.apache.spark.sql.graftbridge.Bridge.unpersistLocalCheckpoint(sym)
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds")
    // edge-free vertices are their own singleton component
    vertices.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("component"), col("id")).as("component"))
  }
}
