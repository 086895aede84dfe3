package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long→wide pivot with an explicit, fixed column list — the reference's
  * `crosstab()` (reference: src/swap.sql:215-259,261-305,307-351,353-397;
  * PG tablefunc requires the hardcoded output column list).
  *
  * Supplying `values` to Spark's `pivot` preserves the fixed column order
  * AND removes the extra distinct-scan Spark would otherwise run to
  * discover pivot values — at 100 TB that scan is a full pass over the
  * fact table, so the fixed list is a scale feature, not just fidelity.
  * PG crosstab takes the first value per cell; `first()` matches.
  */
object PivotFixed {
  def crosstab(
      df: DataFrame,
      rowKey: Seq[String],
      pivotCol: String,
      valueCol: String,
      values: Seq[String]): DataFrame =
    df.groupBy(rowKey.map(col): _*)
      .pivot(pivotCol, values)
      .agg(first(col(valueCol), ignoreNulls = true))

  /** Deterministic variant: cell = SUM instead of first-value, for
    * measures where multiple rows land in one cell.
    */
  def crosstabSum(
      df: DataFrame,
      rowKey: Seq[String],
      pivotCol: String,
      valueCol: String,
      values: Seq[String]): DataFrame =
    df.groupBy(rowKey.map(col): _*)
      .pivot(pivotCol, values)
      .agg(sum(col(valueCol)))
}
