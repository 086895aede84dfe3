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
  * Scale shape: ONE scan, TWO shuffles, no join. The (key, bucket)
  * aggregate shuffles once; a second per-key aggregate packs each
  * key's observed cells into a map next to its [min, max] span; the
  * grid is then a narrow `sequence` + `explode` fan-out (bounded by
  * span/step per key, never a global calendar crossJoin) with an
  * `element_at` lookup into the key's own map, and the forward fill
  * window runs on the partitioning the second aggregate already
  * established. Skew bound: one key's grid (and its cell map) must
  * fit a task — span/step rows, independent of observation count.
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
    val reserved = Set("bucket", "n_obs", "__mn", "__mx", "__cells", "__cell")
    val clash = (keyCols ++ aggExprs.map(_._1))
      .filter(n => reserved(n) || n.endsWith("_fill"))
    require(clash.isEmpty,
      s"key/agg names collide with generated columns: ${clash.mkString(",")}")
    val keys = keyCols.map(col)
    val aggNames = aggExprs.map(_._1)
    // user-facing agg names appear ONLY as final aliases; the pipeline
    // carries positional __a<i> internals, so names with dots (which
    // col() would parse as nested-field access) survive
    val internal = aggNames.indices.map(i => s"__a$i")
    val obs = df.groupBy(keys :+ bucket.as("bucket"): _*)
      .agg(count(lit(1)).as("n_obs"),
        aggExprs.zip(internal).map { case ((_, c), a) => c.as(a) }: _*)
    // pack each key's observed cells into ONE map row alongside the
    // span bounds — a single second-level aggregation instead of a
    // separate bounds agg + grid-to-obs join (which costs either a
    // second full scan+agg of the input or a cache of it; observed in
    // the plan audit). Per-key map size is cells ≤ span/step — the
    // same bound the grid contract already imposes.
    val cell = struct(col("n_obs") +: internal.map(col): _*)
    val packed = obs.groupBy(keys: _*)
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"),
        map_from_entries(collect_list(struct(col("bucket"), cell)))
          .as("__cells"))
    // explode the grid and look each bucket up in the key's own map;
    // the map is projected away before the fill window's sort sees
    // the rows (Generate→Project pipelines row-at-a-time, so the
    // carried map never materializes per grid row)
    val grid = packed.select(
      keys ++ Seq(explode(expr(s"sequence(__mn, __mx, $step)")).as("bucket"),
        col("__cells")): _*)
      .withColumn("__cell", element_at(col("__cells"), col("bucket")))
    val lookedUp = grid.select(
      keys ++ Seq(col("bucket"),
        coalesce(col("__cell").getField("n_obs"), lit(0L)).as("n_obs")) ++
        internal.map(a => col("__cell").getField(a).as(a)): _*)
    val fillW = Window.partitionBy(keys: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = internal.foldLeft(lookedUp) { case (acc, a) =>
      acc.withColumn(s"${a}_fill", last(col(a), ignoreNulls = true).over(fillW))
    }
    filled.select(
      keys ++ Seq(col("bucket"), col("n_obs")) ++
        aggNames.zip(internal).flatMap { case (n, a) =>
          Seq(col(a).as(n), col(s"${a}_fill").as(s"${n}_fill"))
        }: _*)
  }
}
