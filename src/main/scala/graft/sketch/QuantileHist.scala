package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixed-grid histogram quantile sketch — deterministic, bounded-state,
  * mergeable percentile estimation, completing the sketch family
  * (HLL count-distinct, KMV Jaccard, count-min frequency, Bloom
  * membership): the counter table holds at most `nBins` rows per group
  * REGARDLESS of input size, counters merge by addition across
  * partitions/engines/days, and the estimate is pure arithmetic over
  * the counters — exactly reproducible in DuckDB, so estimates
  * hash-match the oracle like every other sketch here.
  *
  * Estimation = linear interpolation inside the first bin whose
  * cumulative count reaches q·total (the classic equi-width histogram
  * estimator). Error is bounded by bin width — callers pick
  * [lo, hi)/nBins for the value domain; out-of-range values clamp to
  * the edge bins (their mass is counted, their position saturates).
  *
  * Scale shape: ONE hash-aggregate to (group, bin) — map-side partial
  * aggregation collapses each partition to ≤ nBins rows before the
  * shuffle — then window/interp arithmetic over ≤ nBins rows per
  * group. An exact percentile at 100 TB needs a full sort of every
  * group's values; this needs neither sort nor more than nBins
  * counters of state.
  */
object QuantileHist {

  private def binCol(v: Column, lo: Double, hi: Double, nBins: Int): Column = {
    val width = (hi - lo) / nBins
    least(greatest(floor((v.cast(DoubleType) - lo) / width).cast(IntegerType),
      lit(0)), lit(nBins - 1))
  }

  /** Counter table: (groupCols…, qh_bin, cnt) — ≤ nBins rows per group,
    * mergeable by addition. Null values are not counted.
    */
  def counters(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins > 0 && hi > lo, "need a positive-width domain and bins")
    df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols.map(col) :+
        binCol(col(valueCol), lo, hi, nBins).as("qh_bin")): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-group quantile estimates for each q in `qs`:
    * (groupCols…, q, est). est is rounded to 6 digits so the
    * engine-boundary comparison is representation-stable.
    */
  def quantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, nBins: Int, qs: Seq[Double]): DataFrame =
    quantilesAt(df, groupCols, valueCol, lo, hi, nBins, qs, rounded = true)

  private def quantilesAt(df: DataFrame, groupCols: Seq[String],
      valueCol: String, lo: Double, hi: Double, nBins: Int,
      qs: Seq[Double], rounded: Boolean): DataFrame =
    quantilesFromCounters(counters(df, groupCols, valueCol, lo, hi, nBins),
      groupCols, lo, hi, nBins, qs, rounded)

  /** The estimator tail over any (groupCols…, qh_bin, cnt) counter
    * frame — the merge/read-back path for histograms persisted at a
    * finer grain (sum the counters per coarse group first; addition
    * is the sketch's exact merge). Arithmetic identical to
    * [[quantiles]]'s tail, so served and direct estimates are
    * bit-equal.
    */
  def quantilesFromCounters(ctr: DataFrame, groupCols: Seq[String],
      lo: Double, hi: Double, nBins: Int, qs: Seq[Double],
      rounded: Boolean = true): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantiles must lie in [0, 1]")
    val width = (hi - lo) / nBins
    val grp = groupCols.map(col)
    val cum = ctr
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(grp: _*).orderBy(col("qh_bin"))))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy(grp: _*)))
      .withColumn("q", explode(array(qs.map(lit): _*)))
    // the picked bin is the FIRST whose cumulative count reaches
    // q·total; bins are unique per group, so min(struct(bin, …)) is
    // the deterministic argmin carrying the interp operands along
    val picked = cum
      .filter(col("cum") >= col("q") * col("total"))
      .groupBy((grp :+ col("q")): _*)
      .agg(min(struct(col("qh_bin"), col("cnt"), col("cum"), col("total")))
        .as("p"))
    val raw = lit(lo) + lit(width) *
      (col("p.qh_bin") +
        (col("q") * col("p.total") - (col("p.cum") - col("p.cnt"))) / col("p.cnt"))
    picked.select((grp :+ col("q") :+
      (if (rounded) round(raw, 6) else raw).as("est")): _*)
  }

  /** Per-GROUP percentile gate: within each group (e.g. source
    * domain), keep rows whose `valueCol` lies in the top `frac` of
    * that group's distribution — the per-domain quality budget of a
    * curation pipeline (a global cutoff would let one high-scoring
    * domain crowd out every other). Costs one grouped histogram
    * aggregate (≤ nBins rows per group) plus an equi-join of the
    * per-group thresholds back — never a per-group sort. The join is
    * deliberately UNHINTED: the threshold frame is one row per group,
    * so AQE broadcasts it whenever the group count is modest, while a
    * forced broadcast hint would bypass the size check and could OOM
    * the driver on a pathological high-cardinality group column.
    */
  /** Per-group winsorization — clamp `valueCol` into its group's
    * [pLo, pHi] sketch-quantile band: the outlier-robust data-cleaning
    * staple (a handful of 10⁸-char documents otherwise dominate any
    * mean/variance feature downstream). Cost: one bounded grouped
    * histogram + a (groups × 2)-row threshold frame joined back —
    * never a per-group sort; same unhinted-join reasoning as
    * [[topFractionByGroup]]. Clamp bounds are the rounded quantile
    * estimates, so the oracle replays the clip exactly. Output: input
    * columns + `<valueCol>_w` (clamped double).
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lo: Double, hi: Double, nBins: Int, pLo: Double,
      pHi: Double): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(pLo >= 0.0 && pLo < pHi && pHi <= 1.0, "need 0 ≤ pLo < pHi ≤ 1")
    val b = quantiles(df, groupCols, valueCol, lo, hi, nBins, Seq(pLo, pHi))
      .groupBy(groupCols.map(col): _*)
      .agg(max(when(col("q") === pLo, col("est"))).as("__w_lo"),
        max(when(col("q") === pHi, col("est"))).as("__w_hi"))
    df.join(b, groupCols)
      .withColumn(valueCol + "_w",
        least(greatest(col(valueCol).cast(DoubleType), col("__w_lo")),
          col("__w_hi")))
      .drop("__w_lo", "__w_hi")
  }

  def topFractionByGroup(df: DataFrame, groupCols: Seq[String],
      valueCol: String, frac: Double, lo: Double, hi: Double,
      nBins: Int): DataFrame = {
    require(groupCols.nonEmpty, "use topFraction for the global gate")
    require(frac > 0.0 && frac <= 1.0, "frac must lie in (0, 1]")
    val thr = quantilesAt(df, groupCols, valueCol, lo, hi, nBins,
      Seq(1.0 - frac), rounded = false)
      .select((groupCols.map(col) :+ col("est").as("__qh_thr")): _*)
    df.join(thr, groupCols)
      .filter(col(valueCol) >= col("__qh_thr"))
      .drop("__qh_thr")
  }

  /** Percentile-threshold gate: keep rows whose `valueCol` lies in the
    * top `frac` of the column's distribution — "keep the best 25% by
    * quality score", the smooth-curation sibling of a fixed threshold
    * (which needs manual retuning as the corpus drifts). The cutoff is
    * this sketch's (1−frac) quantile estimate: ONE bounded
    * hash-aggregate plus a 1-row broadcast, never the full sort an
    * exact percentile needs at 100 TB; accuracy is bin-width-bounded
    * like every estimate here, and fully deterministic. Rows equal to
    * the interpolated threshold are kept (≥). Empty input → empty
    * output.
    */
  def topFraction(df: DataFrame, valueCol: String, frac: Double,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(frac > 0.0 && frac <= 1.0, "frac must lie in (0, 1]")
    // UNROUNDED threshold: quantiles' 6-dp display rounding can round
    // the cutoff UP past the true interpolated value, which would drop
    // rows sitting exactly at it — e.g. frac = 1.0 with the corpus
    // minimum on a bin edge like 3/256 would lose those rows and break
    // the "frac = 1 keeps everything" contract
    val thr = quantilesAt(df, Seq.empty, valueCol, lo, hi, nBins,
      Seq(1.0 - frac), rounded = false)
      .select(col("est").as("__qh_thr"))
    df.crossJoin(broadcast(thr))
      .filter(col(valueCol) >= col("__qh_thr"))
      .drop("__qh_thr")
  }

  /** DuckDB mirror of [[quantiles]] for a single group column. */
  def quantileOracleSql(table: String, groupCol: String, valueCol: String,
      lo: Double, hi: Double, nBins: Int, qs: Seq[Double]): String = {
    val qList = qs.mkString("[", ", ", "]")
    s"""WITH ctr AS (
       |  SELECT $groupCol,
       |    least(greatest(cast(floor((cast($valueCol as double) - $lo) /
       |      (($hi - $lo) / $nBins)) as int), 0), ${nBins - 1}) AS qh_bin,
       |    count(*) AS cnt
       |  FROM $table WHERE $valueCol IS NOT NULL
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT $groupCol, qh_bin, cnt,
       |    sum(cnt) OVER (PARTITION BY $groupCol ORDER BY qh_bin) AS cum,
       |    sum(cnt) OVER (PARTITION BY $groupCol) AS total
       |  FROM ctr),
       |qd AS (
       |  SELECT c.*, u.q FROM cum c, unnest($qList) AS u(q)),
       |cand AS (
       |  SELECT * FROM qd WHERE cum >= q * total),
       |pick AS (
       |  SELECT $groupCol, q, min(qh_bin) AS bin
       |  FROM cand GROUP BY 1, 2)
       |SELECT c.$groupCol, c.q,
       |  round($lo + (($hi - $lo) / $nBins) *
       |    (c.qh_bin + (c.q * c.total - (c.cum - c.cnt)) / c.cnt), 6) AS est
       |FROM cand c JOIN pick p
       |  ON c.$groupCol IS NOT DISTINCT FROM p.$groupCol
       |  AND c.q = p.q AND c.qh_bin = p.bin""".stripMargin
  }
}
