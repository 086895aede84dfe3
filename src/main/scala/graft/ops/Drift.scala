package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distribution-drift monitoring between two corpus snapshots — the
  * continuously-ingested-corpus guardrail: a quality regression in one
  * source (a crawler change, a new spam wave, a parser bug) shows up
  * as a shifted score/length distribution long before row-level diffs
  * ([[SnapshotDiff]]) make it legible. Drift is measured per group as
  * the TOTAL VARIATION distance between fixed-bin histograms,
  * TV = ½·Σ|p_i − q_i| ∈ [0,1] — chosen over PSI/KL deliberately:
  * TV needs no logarithm, and `ln` is per-libm (not cross-engine
  * reproducible) while TV's arithmetic (division, abs, decimal sum)
  * replays bit-for-bit in the DuckDB oracle.
  *
  * Scale shape: each snapshot collapses to a (group × bins) histogram
  * in ONE partial-aggregated pass — everything after that operates on
  * bounded frames (joins and sums over ≤ groups·bins rows), so the
  * comparison cost is independent of corpus size. Per-bin terms are
  * rounded to 9dp and summed as DECIMAL, making the reduction
  * order-independent (double sums are partition-order dependent — the
  * same discipline as the corpus-profile aggregates).
  */
object Drift {

  /** Per-group TV drift of `valueCol` between `oldDf` and `newDf`
    * over `bins` equal-width bins on [lo, hi] (values outside clamp
    * to the edge bins; NULL values are dropped). Only groups present
    * in BOTH snapshots are emitted — appearing/disappearing groups
    * are membership changes, [[SnapshotDiff]]'s jurisdiction, not
    * drift. Output: (groupCol, n_old, n_new, tv) with tv rounded
    * half-up at 6dp.
    */
  def histogramDrift(oldDf: DataFrame, newDf: DataFrame, groupCol: String,
      valueCol: String, lo: Double, hi: Double, bins: Int): DataFrame =
    tvFromHistograms(
      histogram(oldDf, Seq(groupCol), valueCol, lo, hi, bins),
      histogram(newDf, Seq(groupCol), valueCol, lo, hi, bins),
      Seq(groupCol))

  /** Clamped equal-width bin index of `v` over [lo, hi) — the shared
    * binning of the batch drift, the streaming histogram
    * ([[graft.streaming.EventStreams.histogramStream]]), and the
    * DuckDB oracle.
    */
  def binIndex(v: Column, lo: Double, hi: Double, bins: Int): Column = {
    require(bins >= 1 && hi > lo, "need bins >= 1 and hi > lo")
    val width = (hi - lo) / bins
    least(greatest(floor((v.cast(DoubleType) - lo) / width), lit(0.0)),
      lit((bins - 1).toDouble)).cast(IntegerType)
  }

  /** Bounded fixed-bin histogram: one partial-aggregated pass to
    * ≤ |keys|·bins rows of (keys…, bin, cnt). NULL values dropped.
    */
  def histogram(df: DataFrame, keys: Seq[String], valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(keys.map(col) :+ binIndex(col(valueCol), lo, hi, bins).as("bin"): _*)
      .groupBy((keys :+ "bin").map(col): _*).agg(count(lit(1)).as("cnt"))

  /** Per-key TV distance between two pre-binned histograms (each
    * (keys…, bin, cnt)). Only keys present on BOTH sides are emitted;
    * all arithmetic on ≤ |keys|·bins rows. Output:
    * (keys…, n_old, n_new, tv).
    */
  def tvFromHistograms(oldHist: DataFrame, newHist: DataFrame,
      keys: Seq[String]): DataFrame = {
    val ho = oldHist.withColumnRenamed("cnt", "c_old")
    val hn = newHist.withColumnRenamed("cnt", "c_new")
    val kc = keys.map(col)
    val no = ho.groupBy(kc: _*).agg(sum(col("c_old")).as("n_old"))
    val nn = hn.groupBy(kc: _*).agg(sum(col("c_new")).as("n_new"))
    val terms = ho.join(hn, keys :+ "bin", "full_outer")
      .na.fill(0L, Seq("c_old", "c_new"))
      .join(no, keys).join(nn, keys) // both-sides keys only
      .select(kc ++ Seq(col("n_old"), col("n_new"),
        round(abs(col("c_old").cast(DoubleType) / col("n_old").cast(DoubleType) -
          col("c_new").cast(DoubleType) / col("n_new").cast(DoubleType)), 9)
          .cast(DecimalType(20, 9)).as("term")): _*)
    terms.groupBy(kc ++ Seq(col("n_old"), col("n_new")): _*)
      .agg(sum(col("term")).as("tvsum"))
      .select(kc ++ Seq(col("n_old"), col("n_new"),
        round(col("tvsum").cast(DoubleType) / 2.0, 6).as("tv")): _*)
  }

  /** Per-WINDOW drift of streamed histograms against a fixed
    * reference: `windowHist` is
    * [[graft.streaming.EventStreams.histogramStream]]'s output
    * (window_start, group, bin, cnt) read back as a batch frame;
    * `refHist` is a [[histogram]] of the reference corpus
    * (group, bin, cnt). The reference is replicated per closed window
    * (bounded: windows·groups·bins rows) so absent bins count as
    * zero on either side. Output: (window_start, group, n_old, n_new,
    * tv) — n_old the reference total, the alert surface a monitoring
    * job thresholds on.
    */
  def driftVsReference(windowHist: DataFrame, refHist: DataFrame,
      groupCol: String): DataFrame = {
    // the closed-window list is bounded (one row per monitoring
    // window) and collected into a LITERAL frame — also severing the
    // lineage that would otherwise put windowHist's attribute ids on
    // both sides of the full-outer join below
    val winType = windowHist.schema("window_start").dataType
    val wins = windowHist.select(col("window_start")).distinct()
      .collect().map(r => org.apache.spark.sql.Row(r.get(0)))
    val winsDf = windowHist.sparkSession.createDataFrame(
      java.util.Arrays.asList(wins: _*),
      StructType(Seq(StructField("window_start", winType))))
    val refW = refHist.crossJoin(broadcast(winsDf))
      .select(col("window_start"), col(groupCol), col("bin"), col("cnt"))
    tvFromHistograms(refW, windowHist, Seq("window_start", groupCol))
  }
}
