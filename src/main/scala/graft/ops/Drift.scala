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
      valueCol: String, lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins >= 1 && hi > lo, "need bins >= 1 and hi > lo")
    val width = (hi - lo) / bins
    def bin(v: Column): Column =
      least(greatest(floor((v.cast(DoubleType) - lo) / width), lit(0.0)),
        lit((bins - 1).toDouble)).cast(IntegerType)
    def hist(df: DataFrame, cName: String): DataFrame =
      df.filter(col(valueCol).isNotNull)
        .select(col(groupCol), bin(col(valueCol)).as("bin"))
        .groupBy(col(groupCol), col("bin")).agg(count(lit(1)).as(cName))
    val ho = hist(oldDf, "c_old")
    val hn = hist(newDf, "c_new")
    val no = ho.groupBy(col(groupCol)).agg(sum(col("c_old")).as("n_old"))
    val nn = hn.groupBy(col(groupCol)).agg(sum(col("c_new")).as("n_new"))
    val terms = ho.join(hn, Seq(groupCol, "bin"), "full_outer")
      .na.fill(0L, Seq("c_old", "c_new"))
      .join(no, Seq(groupCol)).join(nn, Seq(groupCol)) // both-sides groups
      .select(col(groupCol), col("n_old"), col("n_new"),
        round(abs(col("c_old").cast(DoubleType) / col("n_old").cast(DoubleType) -
          col("c_new").cast(DoubleType) / col("n_new").cast(DoubleType)), 9)
          .cast(DecimalType(20, 9)).as("term"))
    terms.groupBy(col(groupCol), col("n_old"), col("n_new"))
      .agg(sum(col("term")).as("tvsum"))
      .select(col(groupCol), col("n_old"), col("n_new"),
        round(col("tvsum").cast(DoubleType) / 2.0, 6).as("tv"))
  }
}
