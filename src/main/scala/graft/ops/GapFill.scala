package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap repair: densify each key's observations onto a
  * regular time grid and forward-fill the gaps — the resample +
  * last-observation-carried-forward step that precedes any
  * fixed-interval feature pipeline (a sensor/metrics table where
  * "no row" means "unchanged", not "unknown").
  *
  * Scale shape: the grid is generated per key from that key's OWN
  * [min, max] bucket span (`sequence` + `explode` — a narrow,
  * codegen'd fan-out bounded by span/step per key, never a global
  * calendar crossJoin), the observed aggregate joins back on
  * (key, bucket) — one equi-join AQE plans locally since both sides
  * share the groupBy partitioning — and the forward fill is one
  * `last(ignoreNulls)` running window per key. Three shuffles total
  * (obs agg, bounds agg, fill window), each keyed by the same
  * columns. Skew bound: one key's grid must fit a task — span/step
  * rows, independent of observation count.
  */
object GapFill {

  /** Densify to a fixed grid and forward-fill: (keyCols…, bucket,
    * n_obs, agg column per aggExprs, and a `<name>_fill`
    * forward-filled twin for each).
    *
    * @param bucket   truncation of the event time to the grid, e.g.
    *                 `date_trunc("hour", col("ts"))`
    * @param step     SQL interval literal matching `bucket`'s grain,
    *                 e.g. "interval 1 hour"
    * @param aggExprs named aggregates over each (key, bucket) cell;
    *                 empty cells hold NULL and forward-fill from the
    *                 most recent observed cell of the same key
    */
  def fill(df: DataFrame, keyCols: Seq[String], bucket: Column,
      step: String, aggExprs: Seq[(String, Column)]): DataFrame = {
    require(keyCols.nonEmpty && aggExprs.nonEmpty, "need keys and aggs")
    val keys = keyCols.map(col)
    val obs = df.groupBy(keys :+ bucket.as("bucket"): _*)
      .agg(count(lit(1)).as("n_obs"),
        aggExprs.map { case (n, c) => c.as(n) }: _*)
    val grid = obs.groupBy(keys: _*)
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
      .select(keys :+ explode(expr(s"sequence(__mn, __mx, $step)"))
        .as("bucket"): _*)
    val fillW = Window.partitionBy(keys: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = grid.join(obs, keyCols :+ "bucket", "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
    aggExprs.foldLeft(joined) { case (acc, (n, _)) =>
      acc.withColumn(s"${n}_fill", last(col(n), ignoreNulls = true).over(fillW))
    }
  }
}
