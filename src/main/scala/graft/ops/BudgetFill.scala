package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Greedy per-group budget fill — the operator that turns "we can
  * afford B training tokens from each domain" into a concrete row
  * selection: within each group, rows are taken best-first (caller's
  * ordering) until the group's cost budget is exhausted. This is how
  * training mixtures are actually assembled: rank each source by
  * quality, then cut every source at its token budget rather than at
  * an arbitrary document count (documents vary by orders of magnitude
  * in length, so a count cut over/under-shoots the mixture).
  *
  * Semantics: a row survives iff the running cost total up to AND
  * INCLUDING it is ≤ `budget` — the first row that would overflow the
  * budget is dropped, along with everything after it in the group's
  * order. A single row costlier than the whole budget is therefore
  * dropped even as the group's best row (strict-knapsack reading;
  * callers wanting "always keep at least one" can union the rank-1
  * row back). NULL costs make the running sum NULL from that row on,
  * which fails the ≤ filter — order NULL-cost rows last or filter
  * them out beforehand.
  *
  * Scale shape: ONE hash partition by `groupCols` plus a per-group
  * sort for the running-sum window — the minimum any
  * order-sensitive prefix semantics can cost; no self-join, no
  * driver-side state. Unlike a rank-≤-k filter there is no
  * WindowGroupLimit map-side pruning (the cutoff depends on the SUM,
  * not the row number), so each group's rows do flow to its reducer —
  * at 100 TB keep groups at domain granularity (dozens–thousands of
  * groups), not per-key, and pre-aggregate finer grains first.
  */
object BudgetFill {

  /** Keep each group's best-first prefix whose cumulative `costCol`
    * stays within `budget`. Output = input columns + `cum_cost` (the
    * running total including the row). `order` must be a total order
    * within each group (add a unique id tiebreak) — a tie straddling
    * the budget boundary would otherwise make the kept set
    * nondeterministic under re-runs and across engines.
    */
  def fill(df: DataFrame, groupCols: Seq[String], costCol: String,
      order: Seq[Column], budget: Double): DataFrame = {
    require(groupCols.nonEmpty, "budget fill is per-group")
    require(order.nonEmpty, "an explicit total order is required")
    require(budget >= 0, "budget must be non-negative")
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("cum_cost", sum(col(costCol)).over(w))
      .filter(col("cum_cost") <= budget)
  }
}
