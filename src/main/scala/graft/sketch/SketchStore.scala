package graft.sketch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED KMV sketch store — the cardinality-serving sibling of
  * [[graft.text.Bm25Index]] and the ANN index: at 100 TB you sketch
  * the raw data ONCE at the finest useful grain and answer every
  * later distinct-count question — any coarser rollup, any set
  * overlap — from the stored k-row registers, never re-scanning the
  * corpus. The trim-after-merge identity q_kmv_rollup pins
  * (kminₖ(kminₖ(A) ∪ kminₖ(B)) = kminₖ(A ∪ B)) is what makes the
  * stored fine sketches EXACTLY as good as sketching the rollup
  * directly — not approximately: the merged registers are
  * bit-identical, so the serving answer replays against a raw-data
  * oracle.
  *
  * Table layout: one row per fine group, the sketch as an
  * array<long> registers column, bucketed by the leading rollup key
  * so a rollup merge is a bucket-local aggregation. Staleness uses
  * the [[graft.dedup.IncrementalDedup]] fingerprint discipline
  * (count + wrapping content-hash sum in table properties;
  * [[ensure]] rebuilds on drift, reuses otherwise).
  */
object SketchStore {

  /** The staleness fingerprint must cover EVERY column the sketch
    * depends on — grain columns included: a row whose day or group
    * flips while its id/value stay fixed re-keys a register, and a
    * fingerprint blind to the grain would keep serving the stale
    * table. One synthesized content column = concat of grain + value.
    */
  private def fpContent(src: DataFrame, fineCols: Seq[String],
      valueCol: String): DataFrame =
    src.withColumn("__fp_content",
      concat_ws("",
        (fineCols :+ valueCol).map(c => col(c).cast("string")): _*))

  /** Persist (or reuse) the KMV sketch table of `valueCol` at the
    * `fineCols` grain. `fpIdCol` identifies source rows for the
    * staleness fingerprint; the content side of the fingerprint is
    * the full (grain, value) tuple. Returns true when a (re)build
    * happened.
    */
  def ensure(src: DataFrame, fineCols: Seq[String], valueCol: String,
      k: Int, table: String, nBuckets: Int,
      fpIdCol: String): Boolean =
    graft.dedup.IncrementalDedup.ensureBucketedState(
      fpContent(src, fineCols, valueCol), fpIdCol, "__fp_content",
      table, nBuckets,
      bucketCols = Seq(fineCols.head), sortCols = fineCols)(
      Kmv.sketch(src, fineCols, valueCol, k))

  /** Persist (or reuse) a fixed-grid histogram counter table of
    * `valueCol` at the `fineCols` grain — same staleness discipline
    * as [[ensure]]; counters merge by exact integer addition, so any
    * coarser rollup served from the store is bit-equal to sketching
    * the rollup directly.
    */
  def ensureHist(src: DataFrame, fineCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, nBins: Int, table: String, nBuckets: Int,
      fpIdCol: String): Boolean =
    graft.dedup.IncrementalDedup.ensureBucketedState(
      fpContent(src, fineCols, valueCol), fpIdCol, "__fp_content",
      table, nBuckets,
      bucketCols = Seq(fineCols.head), sortCols = fineCols)(
      QuantileHist.counters(src, fineCols, valueCol, lo, hi, nBins))

  /** Quantile estimates at the `coarseCols` grain served FROM the
    * persisted histogram store: one integer counter merge per coarse
    * group (≤ nBins rows each), then the shared estimator tail.
    */
  def serveHistQuantiles(spark: SparkSession, table: String,
      coarseCols: Seq[String], lo: Double, hi: Double, nBins: Int,
      qs: Seq[Double]): DataFrame = {
    val merged = spark.table(table)
      .groupBy((coarseCols.map(col) :+ col("qh_bin")): _*)
      .agg(sum(col("cnt")).as("cnt"))
    QuantileHist.quantilesFromCounters(merged, coarseCols, lo, hi, nBins, qs)
  }

  /** Distinct-count estimates at the `coarseCols` grain served FROM
    * the persisted store: explode the stored registers, re-trim to
    * the k smallest distinct per coarse group (one bounded
    * aggregation over k·fine-groups rows — never the raw data), and
    * finalize with the shared estimator tail.
    */
  def serveRollup(spark: SparkSession, table: String,
      coarseCols: Seq[String], k: Int): DataFrame = {
    val merged = spark.table(table)
      .select((coarseCols.map(col) :+ explode(col("hs")).as("h")): _*)
      .groupBy(coarseCols.map(col): _*)
      .agg(graft.functions.KMinAgg.k_min_distinct(col("h"), k).as("hs"))
    Kmv.estimateFromSketch(merged, coarseCols, k)
  }
}
