package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bottom-up hierarchy rollup over a path-array column — the reference
  * workload's "crown jewel" construct, re-expressed as a bounded
  * iterative DataFrame loop instead of SQL `WITH RECURSIVE`
  * (reference: src/nass.sql:198-230 harvest/SUM, :322-357 yield/AVG,
  * :409-436 price/AVG — three structurally identical recursive CTEs).
  *
  * Faithful semantics of the reference pattern:
  *  - base = leaf rows (UNION dedups the base set);
  *  - each round, every NEWLY-ADDED row with a non-empty path emits its
  *    parent row: path minus last element, measures aggregated over the
  *    window PARTITION BY (groupKeys, parentPath) — carry columns (e.g.
  *    harvest's `unit`, src/nass.sql:221-222) ride along un-partitioned,
  *    so one parent row survives per distinct carry value;
  *  - recursive UNION dedups each emitted row against the ENTIRE
  *    accumulated set; only genuinely new rows feed the next round;
  *  - finalization aggregates all accumulated rows by
  *    (groupKeys, path, carry) because one parent is reachable from
  *    several sibling groups / rounds (src/nass.sql:224-230).
  *
  * Scale design: the loop is bounded by PATH DEPTH (≤ ~5 in practice),
  * never data size, so plan depth is constant at 100 TB. The depth is
  * measured once up front (a tiny agg over the persisted leaf set) and
  * the loop then runs exactly that many rounds with NO per-round driver
  * actions. Each round is one aggregation shuffle (plain groupBy with
  * map-side combine when there are no carry columns; the reference's
  * window-partition form only when carry columns require it) + one
  * except when cross-round dedup is on. Per-round frames are persisted
  * (lineage stays O(1), each level computes once) and registered with
  * [[graft.CacheRegistry]] so the session owner can release them after
  * the consuming action. No row data ever reaches the driver.
  */
object HierarchyRollup {

  sealed trait Mode { def agg(c: Column): Column }
  case object SumMode extends Mode { def agg(c: Column): Column = sum(c) }
  case object AvgMode extends Mode { def agg(c: Column): Column = avg(c) }

  /** Leaf detection: rows whose path is not the parent-path of any other
    * row under the same keys (reference anti-join idiom,
    * src/nass.sql:201-212 — LEFT JOIN … WHERE r IS NULL → left_anti).
    */
  def leaves(df: DataFrame, keys: Seq[String], pathCol: String): DataFrame = {
    // PG `p[1:array_length(p,1)-1]` is NULL for an empty path (array_length
    // of {} is NULL), and NULL never matches in the anti-join — so an
    // empty-path row stays a leaf unless some length-1 sibling exists.
    val parents = df
      .filter(size(col(pathCol)) > 0)
      .select((keys.map(col) :+
        slice(col(pathCol), lit(1), size(col(pathCol)) - 1)
          .as(pathCol)).toIndexedSeq: _*)
    df.join(parents, keys :+ pathCol, "left_anti")
  }

  /** @param leafRows  leaf rows of the hierarchy
    * @param groupKeys grouping columns that define sibling windows
    * @param pathCol   array<string> hierarchy path column name
    * @param measures  measure columns to aggregate upward
    * @param mode      SumMode (additive) or AvgMode (rates)
    * @param carry     columns carried through un-partitioned (a parent row
    *                  is emitted per distinct carry value)
    * @param maxRounds safety bound on recursion depth
    * @param crossRoundDedup PG recursive-UNION dedups each emitted row
    *                  against the ENTIRE accumulated set. When all
    *                  leaves share one path depth, rows emitted in
    *                  different rounds have different path lengths and
    *                  can never collide — pass false to skip the
    *                  per-round `except` (one distributed set-diff per
    *                  level saved; identical result for uniform-depth
    *                  forests)
    * @return all nodes (leaves + synthesized ancestors incl. empty-path
    *         roots), schema (groupKeys…, pathCol, carry…, measures…)
    */
  def rollup(
      leafRows: DataFrame,
      groupKeys: Seq[String],
      pathCol: String,
      measures: Seq[String],
      mode: Mode,
      carry: Seq[String] = Nil,
      maxRounds: Int = 12,
      crossRoundDedup: Boolean = true): DataFrame = {

    val outCols = (groupKeys :+ pathCol) ++ carry ++ measures
    val parentExpr =
      slice(col(pathCol), lit(1), greatest(size(col(pathCol)) - 1, lit(0)))

    val base = graft.CacheRegistry.register(
      leafRows.select(outCols.map(col).toIndexedSeq: _*).distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))

    // The recursion is bounded by PATH DEPTH: every round strips one
    // path element, so after max(size(path)) rounds the frontier holds
    // only empty paths and emits nothing. Measuring the depth up front
    // (one tiny agg job over the persisted base) lets the loop run a
    // FIXED number of rounds with zero per-round driver actions — the
    // old per-round isEmpty() forced a job per level.
    val depthRow = base.agg(max(size(col(pathCol)))).head()
    val depth = if (depthRow.isNullAt(0)) 0 else depthRow.getInt(0)

    var acc = base
    var frontier = base
    var round = 0
    while (round < math.min(depth, maxRounds)) {
      val live = frontier.filter(size(col(pathCol)) > 0)
      val emitted =
        if (carry.isEmpty) {
          // no carry columns → the window-then-distinct collapses to a
          // plain groupBy: identical result (one row per sibling
          // group), but with map-side partial aggregation and one
          // shuffle instead of the window's sort-shuffle + distinct
          val aggs = measures.map(m => mode.agg(col(m)).as(m))
          live.groupBy((groupKeys.map(col) :+ parentExpr.as(pathCol)): _*)
            .agg(aggs.head, aggs.tail: _*)
        } else {
          // carry columns ride along UN-partitioned (reference window,
          // src/nass.sql:221-222): every row of a sibling group carries
          // the group-wide aggregate, and distinct keeps one parent row
          // per distinct carry value — not expressible as a groupBy
          val w = Window.partitionBy((groupKeys.map(col) :+ parentExpr): _*)
          live.select((groupKeys.map(col) :+ parentExpr.as(pathCol)) ++
            carry.map(col) ++
            measures.map(m => mode.agg(col(m)).over(w).as(m)): _*)
            .distinct()
        }
      val newRows = graft.CacheRegistry.register(
        (if (crossRoundDedup) emitted.except(acc) else emitted)
          .persist(StorageLevel.MEMORY_AND_DISK))
      acc = acc.unionByName(newRows)
      frontier = newRows
      round += 1
    }
    val aggs = measures.map(m => mode.agg(col(m)).as(m))
    acc
      .groupBy(((groupKeys :+ pathCol) ++ carry).map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
