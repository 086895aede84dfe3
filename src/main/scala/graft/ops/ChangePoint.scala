package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DoubleType, LongType}

/** One-sided CUSUM change-point detection over per-key daily series —
  * the sequential-monitoring readout (Page 1954) a pipeline runs on its
  * ingest volumes and metric means: "did this source's daily level
  * SHIFT, and on which day did the evidence cross the line", which a
  * per-day threshold misses for small sustained shifts (CUSUM
  * accumulates them) and an end-to-end mean hides entirely.
  *
  *   S_0 = 0;  S_i = max(0, S_{i-1} + ((x_i − μ) − κ));  alarm: S_i > h
  *
  * with the textbook allowance κ = σ/2 and decision interval h = 4σ,
  * μ/σ estimated from the window itself (exact integer moments).
  *
  * Determinism/oracle contract: daily values are quantized to integer
  * milli-unit MEANS (magnitude bounded by the metric's range, not the
  * corpus — the moment sums stay in exact longs at any scale), and the
  * recursion is identically-ordered IEEE double ops, so a DuckDB
  * recursive CTE replays it bit-for-bit.
  *
  * Scale shape: the corpus reduces via ONE (key, day) map-combined
  * aggregate; everything after is per-key frames bounded by the DAY
  * RANGE (a year of monitoring = 365 elements), carried as a sorted
  * array and folded by the `aggregate` higher-order function — a
  * codegen'd per-row state machine, no iterative jobs, no driver loop,
  * no per-key shuffle beyond the one aggregate.
  */
object ChangePoint {

  /** Per-key CUSUM report over a (key, day, milli-mean) daily frame:
    * (key, n_days, mu, sigma, max_s, first_alarm, n_alarms) — mu/sigma/
    * max_s in milli-units rounded to 6 dp, first_alarm the first day
    * the statistic crossed h (NULL if never).
    */
  def cusum(daily: DataFrame, keyCol: String): DataFrame = {
    val stats = daily.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"),
        sum(col("m")).as("sx"),
        sum(col("m") * col("m")).as("sx2"))
      .withColumn("mu",
        col("sx").cast(DoubleType) / col("n_days").cast(DoubleType))
      .withColumn("sigma", sqrt(greatest(lit(0.0d),
        col("sx2").cast(DoubleType) / col("n_days").cast(DoubleType) -
          col("mu") * col("mu"))))
      .withColumn("kappa", col("sigma") * 0.5d)
      .withColumn("h", col("sigma") * 4.0d)
    val series = daily.groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("day"), col("m"))))
        .as("ds"))
    val init = struct(
      lit(0.0d).as("s"), lit(0.0d).as("maxs"),
      lit(null).cast(DateType).as("alarm"), lit(0L).as("n_alarms"))
    val folded = series.join(stats, Seq(keyCol))
      .withColumn("st", aggregate(col("ds"), init, (acc, e) => {
        val s1 = greatest(lit(0.0d), acc.getField("s") +
          ((e.getField("m").cast(DoubleType) - col("mu")) - col("kappa")))
        struct(
          s1.as("s"),
          greatest(acc.getField("maxs"), s1).as("maxs"),
          when(acc.getField("alarm").isNotNull, acc.getField("alarm"))
            .otherwise(when(s1 > col("h"), e.getField("day")))
            .as("alarm"),
          (acc.getField("n_alarms") +
            when(s1 > col("h"), 1L).otherwise(0L)).as("n_alarms"))
      }))
    folded.select(col(keyCol), col("n_days"),
      round(col("mu"), 6).as("mu"),
      round(col("sigma"), 6).as("sigma"),
      round(col("st.maxs"), 6).as("max_s"),
      // ISO string, not DATE: engines disagree on how a date SURFACES
      // (DuckDB→pandas promotes date32 to datetime64) even when the
      // day is identical — the string pins the representation
      date_format(col("st.alarm"), "yyyy-MM-dd").as("first_alarm"),
      col("st.n_alarms").as("n_alarms"))
  }

  /** Daily milli-unit mean frame from an event stream: one map-combined
    * (key, day) aggregate — the only corpus-sized stage.
    */
  def dailyMilliMean(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame =
    events
      .filter(col(valueCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), to_date(col(tsCol)).as("day"),
        round(col(valueCol) * 1000.0d).cast(LongType).as("v"))
      .groupBy(col(keyCol), col("day"))
      .agg(round(sum(col("v")).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).cast(LongType).as("m"))
}
