package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Deterministic Poisson bootstrap — uncertainty estimates for corpus
  * statistics computed in ONE distributed pass (Chamandy et al.,
  * "Estimating uncertainty for massive data streams", Google 2012; the
  * standard bootstrap-on-MapReduce construction). Classical resampling
  * draws n rows with replacement B times — unshardable, since a row's
  * multiplicity depends on the global draw. The Poisson approximation
  * makes each row's replicate-b multiplicity an INDEPENDENT
  * Poisson(1) draw, so it's a pure per-row map: no coordination, no
  * second pass, and the aggregate of each replicate is an ordinary
  * map-side-combined hash aggregate.
  *
  * Determinism contract (what makes this oracle-checkable and re-run
  * stable): the Poisson draw is the inverse CDF applied to the row's
  * [[Sampling.coordinate]] hash at key "key:b" — a pure function of
  * (row key, replicate index). Re-runs, backfills, and the DuckDB
  * oracle agree count-for-count; CDF breakpoints are 6-dp literals
  * baked from one Scala constant list into both engines. Counts are
  * capped at [[MaxCount]] (P(X>6) ≈ 8·10⁻⁵ — a documented truncation,
  * identical everywhere, immaterial to CI width).
  *
  * Scale shape: the per-row B-way expansion feeds straight into a
  * partial aggregate, so shuffle volume is groups×B rows REGARDLESS of
  * corpus size; the CI order statistics run on the groups×B frame. The
  * only corpus-proportional cost is B× map-side CPU on one scan — the
  * price of B resamples in a single pass.
  */
object Bootstrap {

  /** Replicate counts above this are truncated (cumulative Poisson(1)
    * mass beyond 6 is ~8.3e-5).
    */
  val MaxCount = 7

  /** Cumulative Poisson(1) CDF at k = 0..MaxCount-1, rounded to 6 dp —
    * the single source of truth for both engines' CASE chains.
    */
  val cdfBreaks: Seq[Double] = {
    val fact = (0 until MaxCount).scanLeft(1.0)((a, i) => a * (i + 1))
    (0 until MaxCount).map { k =>
      val c = math.exp(-1.0) * fact.take(k + 1).map(1.0 / _).sum
      math.rint(c * 1e6) / 1e6
    }
  }

  /** Poisson(1) multiplicity of a uniform coordinate u ∈ [0,1):
    * the number of CDF breakpoints at or below u.
    */
  def poissonCount(u: Column): Column =
    cdfBreaks.map(t => when(u >= t, 1L).otherwise(0L)).reduce(_ + _)

  /** SQL mirror of [[poissonCount]] over a uniform-coordinate expr. */
  def poissonCountSql(uExpr: String): String =
    cdfBreaks.map(t =>
      f"(CASE WHEN $uExpr >= cast($t%.6f as double) THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** Per-group bootstrap of the mean of an integral column: point
    * estimate plus [lo, hi] percentile CI from `b` Poisson replicates
    * (CI bounds are the 2nd-smallest and 2nd-largest replicate means —
    * the ~2.5%/97.5% order statistics at the default b = 64). Output:
    * (groupCol, n_boot, mean_<valueCol>, ci_lo, ci_hi).
    *
    * `valueCol` must be integral: replicate sums are exact longs, so
    * each replicate mean is one double division — cross-engine exact.
    * A replicate that draws zero total count is dropped (deterministic
    * on both sides; at any real group size P ≈ e^(-n)).
    */
  def meanCi(df: DataFrame, keyCol: String, groupCol: String,
      valueCol: String, b: Int = 64): DataFrame = {
    val reps = df
      .select(col(keyCol).cast(StringType).as("__k"), col(groupCol),
        col(valueCol).cast(LongType).as("__v"))
      .withColumn("__b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("__c", poissonCount(Sampling.coordinate(
        concat(col("__k"), lit(":"), col("__b").cast(StringType)))))
    val means = reps
      .groupBy(col(groupCol), col("__b"))
      .agg(sum(col("__c") * col("__v")).as("__scx"),
        sum(col("__c")).as("__sc"))
      .filter(col("__sc") > 0L)
      .withColumn("__mean", round(
        col("__scx").cast(DoubleType) / col("__sc").cast(DoubleType), 6))
    // order statistics over the groups×B frame (ties broken by
    // replicate index — total order, engine-independent)
    val wOrd = Window.partitionBy(col(groupCol))
      .orderBy(col("__mean"), col("__b"))
    val wAll = Window.partitionBy(col(groupCol))
    val ranked = means
      .withColumn("__rn", row_number().over(wOrd).cast(LongType))
      .withColumn("__cnt", count(lit(1)).over(wAll))
    val ci = ranked.groupBy(col(groupCol))
      .agg(max(col("__cnt")).as("n_boot"),
        max(when(col("__rn") === 2L, col("__mean"))).as("ci_lo"),
        max(when(col("__rn") === col("__cnt") - 1L, col("__mean")))
          .as("ci_hi"))
    val full = df.groupBy(col(groupCol))
      .agg(round(sum(col(valueCol).cast(LongType)).cast(DoubleType) /
        count(lit(1)).cast(DoubleType), 6).as(s"mean_$valueCol"))
    full.join(ci, Seq(groupCol))
  }
}
