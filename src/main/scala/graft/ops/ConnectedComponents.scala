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
  * Every vertex starts labeled with its own id; each round it takes the
  * minimum label over itself and its neighbors (one join + one
  * aggregation on the symmetrized edge list), then compresses paths by
  * re-reading its label's label (one self-join). Pointer jumping halves
  * label-tree depth per round, so convergence takes O(log diameter)
  * rounds, not O(diameter) — the difference between 5 and 5,000 rounds
  * on a chain-shaped component.
  *
  * Scale shape: per round, one shuffle join of edges against labels,
  * one min-aggregation, and one labels-to-labels join — all keyed
  * shuffles AQE can size; no driver-side data beyond a two-long
  * convergence aggregate per round. Each round's label frame is
  * localCheckpoint-ed EAGERLY: the pointer-jump self-join references
  * the previous frame twice, so without lineage truncation the logical
  * plan doubles per round (observed: a 400 MB plan string by round 8 —
  * analysis cost, not data, becomes the bottleneck); with it, every
  * round analyzes a constant-size plan over the previous round's RDD.
  * Superseded checkpoint storage is unpinned by the ContextCleaner once
  * the frame reference is dropped. localCheckpoint trades off executor-
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

  /** @param vertices one column `idCol`, one row per vertex (vertices
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
    val sym = graft.CacheRegistry.register(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
        .filter(col("src") =!= col("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))

    // overflow-proof fixpoint metric: sum of labels as decimal(38,0)
    def labelSum(df: DataFrame): Any =
      df.agg(sum(col("component").cast("decimal(38,0)"))).head().get(0)

    var labels = vertices
      .select(col(idCol).as("id"), col(idCol).as("component"))
      .localCheckpoint(true)
    var prevSum = labelSum(labels)
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      // neighbor-min propagation: component'(v) = min over {v} ∪ N(v)
      val nbrMin = sym
        .join(labels, sym("src") === labels("id"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("component")).as("nbr_component"))
      val propagated = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("component"),
            coalesce(col("nbr_component"), col("component")))
            .as("component"))
      // pointer jumping: component'(v) = component(component(v)) —
      // labels are always existing vertex ids, and a vertex's label is
      // ≤ its id, so the jump is well-defined and non-increasing.
      // EAGER localCheckpoint: truncates lineage (see scale note above)
      // and materializes in one step.
      val jumped = propagated.as("l")
        .join(propagated.select(col("id").as("jid"),
          col("component").as("jcomponent")).as("j"),
          col("l.component") === col("j.jid"), "left")
        .select(col("l.id").as("id"),
          coalesce(col("jcomponent"), col("l.component")).as("component"))
        .localCheckpoint(true)
      // one tiny driver-side aggregate per round detects the fixpoint
      // (labels are non-increasing, so an unchanged sum means no label
      // moved)
      val s = labelSum(jumped)
      converged = s == prevSum
      prevSum = s
      labels = jumped
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds")
    labels
  }
}
