package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-15 statistical extensions: two-sample tests (Welch t,
  * Mann–Whitney U), one-way ANOVA, Spearman rank correlation, robust
  * trend readouts (Mann–Kendall, Theil–Sen, lagged ACF), graph link
  * prediction (Adamic–Adar / resource-allocation / neighbor-Jaccard),
  * Jensen–Shannon corpus divergence, effective sample size, and
  * trimmed means — each a Spark-first operator (graft.ops) paired
  * with an operation-for-operation DuckDB replay.
  */
private[queries] trait Stats2Queries extends StatsExtQueries {

  // ---------------------------------------------------------------
  // q_welch_t — purchase vs view event values, unequal variances
  // ---------------------------------------------------------------

  /** Welch's t between purchase and view event values (micro-unit
    * quantized) — the default two-cohort metric comparison when
    * variances differ ([[graft.ops.HypoTests.welchT]]): two moment
    * rows pivoted to one scalar finalization.
    */
  def qWelchT(s: SparkSession, d: String): DataFrame =
    graft.ops.HypoTests.welchT(
      Tables.events(s, d)
        .filter(col("event_type").isin("purchase", "view")),
      col("event_type") === "purchase",
      round(col("value") * 1000000.0).cast(LongType))

  val qWelchTSql: String =
    s"""WITH src AS (
       |  SELECT event_type = 'purchase' AS a,
       |    cast(round(value * 1000000.0) as bigint) AS x
       |  FROM events WHERE event_type IN ('purchase', 'view')),
       |${graft.ops.HypoTests.welchOracleSql("src")}
       |SELECT n_a, n_b, mean_a, mean_b, t_stat, df_ws FROM welch"""
      .stripMargin

  // ---------------------------------------------------------------
  // q_mann_whitney — rank-sum of quantities, returned vs not
  // ---------------------------------------------------------------

  /** Mann–Whitney U (tie-corrected) of lineitem quantity between
    * returned (R) and other line items — the distribution-free
    * alternative to q_welch_t when the metric is ordinal or
    * heavy-tailed. Ranks aggregate over the ~50-value quantity
    * domain, so the rank window is bounded at any corpus size.
    */
  def qMannWhitney(s: SparkSession, d: String): DataFrame =
    graft.ops.HypoTests.mannWhitney(
      Tables.lineitem(s, d),
      col("l_returnflag") === "R",
      round(col("l_quantity")).cast(LongType))

  val qMannWhitneySql: String =
    s"""WITH src AS (
       |  SELECT l_returnflag = 'R' AS a,
       |    cast(round(l_quantity) as bigint) AS x
       |  FROM lineitem),
       |${graft.ops.HypoTests.mannWhitneyOracleSql("src")}
       |SELECT n_a, n_b, u_a_x2, tie_cube, z_stat FROM mwu""".stripMargin

  // ---------------------------------------------------------------
  // q_kruskal — quantity ranks across the three return flags
  // ---------------------------------------------------------------

  /** Kruskal–Wallis H (tie-corrected, with ε² effect size) of
    * lineitem quantity across the three return flags — the k-group
    * extension of q_mann_whitney and the rank-based counterpart of
    * q_anova, closing the two-sample→k-sample gap for ordinal
    * metrics. Ranks aggregate over the ~50-value quantity domain
    * before the one bounded window; per-group Rᵢ²/nᵢ terms are
    * micro-quantized and summed as integers (the q_anova
    * order-free-total discipline).
    */
  def qKruskal(s: SparkSession, d: String): DataFrame =
    graft.ops.HypoTests.kruskalWallis(
      Tables.lineitem(s, d),
      col("l_returnflag"),
      round(col("l_quantity")).cast(LongType))

  val qKruskalSql: String =
    s"""WITH src AS (
       |  SELECT l_returnflag AS g,
       |    cast(round(l_quantity) as bigint) AS x
       |  FROM lineitem),
       |${graft.ops.HypoTests.kruskalWallisOracleSql("src")}
       |SELECT k, n, tie_cube, h_stat, eps_sq FROM kw""".stripMargin

  // ---------------------------------------------------------------
  // q_brown_forsythe — variance homogeneity of quantity across flags
  // ---------------------------------------------------------------

  /** Brown–Forsythe robust variance-homogeneity F of lineitem
    * quantity across return flags — the median-centered Levene test
    * that gates q_anova's equal-variance reading. Per-group medians
    * are doubled-integer order statistics off the bounded value
    * domain; deviations and their squares stay exact integers until
    * the per-group micro-quantization (q_anova discipline).
    */
  def qBrownForsythe(s: SparkSession, d: String): DataFrame =
    graft.ops.HypoTests.brownForsythe(
      Tables.lineitem(s, d),
      col("l_returnflag"),
      round(col("l_quantity")).cast(LongType))

  val qBrownForsytheSql: String =
    s"""WITH src AS (
       |  SELECT l_returnflag AS g,
       |    cast(round(l_quantity) as bigint) AS x
       |  FROM lineitem),
       |${graft.ops.HypoTests.brownForsytheOracleSql("src")}
       |SELECT k, n, bf_stat, eta_sq FROM bf""".stripMargin

  // ---------------------------------------------------------------
  // q_anova — extended price across the three return flags
  // ---------------------------------------------------------------

  /** One-way ANOVA F of extended price (cents) across return flags —
    * "does the segment move the metric at all" before per-segment
    * readouts; per-group between-variance contributions quantized to
    * integer micro-units so the cross-group total is order-free.
    */
  def qAnova(s: SparkSession, d: String): DataFrame =
    graft.ops.HypoTests.anovaF(
      Tables.lineitem(s, d), col("l_returnflag"),
      round(col("l_extendedprice") * 100).cast(LongType))

  val qAnovaSql: String =
    s"""WITH src AS (
       |  SELECT l_returnflag AS g,
       |    cast(round(l_extendedprice * 100) as bigint) AS x
       |  FROM lineitem),
       |${graft.ops.HypoTests.anovaOracleSql("src")}
       |SELECT k, n, eta_sq, f_stat FROM anova""".stripMargin

  // ---------------------------------------------------------------
  // q_spearman — quantity vs price rank correlation per flag
  // ---------------------------------------------------------------

  /** Spearman ρ of quantity vs extended price per return flag
    * ([[graft.ops.RankCorr.spearmanByGroup]]). Price ranks on
    * TEN-DOLLAR bands — a deliberately BOUNDED grid (~10⁴ values) so
    * the per-group rank window stays value-domain-sized at any
    * corpus scale (whole dollars measured 19 s at sf1: ~2M distinct
    * (group, value) rows funneled through 3 group-partitions);
    * monotone bucketing only coarsens ties, which is the documented
    * contract for rank stats on continuous metrics.
    */
  def qSpearman(s: SparkSession, d: String): DataFrame =
    graft.ops.RankCorr.spearmanByGroup(
      Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
        round(col("l_quantity")).cast(LongType).as("q"),
        round(col("l_extendedprice") / 10.0).cast(LongType).as("p")),
      Seq("flag"), col("q"), col("p"))

  val qSpearmanSql: String =
    s"""WITH src AS (
       |  SELECT l_returnflag AS flag,
       |    cast(round(l_quantity) as bigint) AS x,
       |    cast(round(l_extendedprice / 10.0) as bigint) AS y
       |  FROM lineitem),
       |${graft.ops.RankCorr.spearmanOracleSql("src", Seq("flag"))}
       |SELECT flag, n, rho FROM spearman""".stripMargin

  // ---------------------------------------------------------------
  // daily event series — the shared bounded series for trend readouts
  // ---------------------------------------------------------------

  /** Daily micro-unit value totals per event type: the bounded
    * (type, day) series (30 points per type regardless of corpus
    * size) the pairwise trend statistics run on — aggregate first,
    * O(n²) on the aggregate, never on rows.
    */
  private def dailySeries(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type").as("g"),
        datediff(to_date(col("ts")), to_date(lit("2024-01-01")))
          .cast(IntegerType).as("t"),
        round(col("value") * 1000000.0).cast(DecimalType(38, 0)).as("v"))
      .groupBy(col("g"), col("t"))
      .agg(sum(col("v")).cast(LongType).as("y"))

  private val dailySeriesSql: String =
    """series AS (
      |  SELECT event_type AS g,
      |    date_diff('day', DATE '2024-01-01', cast(ts as date)) AS t,
      |    cast(sum(cast(round(value * 1000000.0) as decimal(38,0)))
      |      as bigint) AS y
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** Mann–Kendall trend test per event type over the daily value
    * series — the nonparametric "is this metric drifting" monitor
    * ([[graft.ops.TrendRobust.mannKendall]]).
    */
  def qMannKendall(s: SparkSession, d: String): DataFrame =
    graft.ops.TrendRobust.mannKendall(dailySeries(s, d), Seq("g"))

  val qMannKendallSql: String =
    s"""WITH $dailySeriesSql,
       |${graft.ops.TrendRobust.mannKendallOracleSql("series", Seq("g"))}
       |SELECT g, n, s_stat, var_s, z_stat FROM mk""".stripMargin

  /** Theil–Sen median slope per event type over the same series —
    * the robust trend ESTIMATE next to q_mann_kendall's test
    * ([[graft.ops.TrendRobust.theilSen]]): median of all pairwise
    * slopes, immune to ~29% outlier days.
    */
  def qTheilSen(s: SparkSession, d: String): DataFrame =
    graft.ops.TrendRobust.theilSen(dailySeries(s, d), Seq("g"))

  val qTheilSenSql: String =
    s"""WITH $dailySeriesSql,
       |${graft.ops.TrendRobust.theilSenOracleSql("series", Seq("g"))}
       |SELECT g, n_pairs, slope_ppm, slope FROM tsen""".stripMargin

  /** Lagged autocorrelation (lags 1..5) of the daily series per
    * event type — the seasonality/momentum diagnostic
    * ([[graft.ops.TrendRobust.acf]]).
    */
  def qAcf(s: SparkSession, d: String): DataFrame =
    graft.ops.TrendRobust.acf(dailySeries(s, d), Seq("g"), maxLag = 5)

  val qAcfSql: String =
    s"""WITH $dailySeriesSql,
       |${graft.ops.TrendRobust.acfOracleSql("series", Seq("g"), 5)}
       |SELECT g, lag, n, r FROM acf""".stripMargin

  // ---------------------------------------------------------------
  // q_adamic_adar — link prediction on the co-purchase graph
  // ---------------------------------------------------------------

  /** Top-20 predicted links on the co-purchase part graph by
    * Adamic–Adar, with resource-allocation and neighbor-Jaccard
    * scores on the same row ([[graft.ops.LinkPredict.adamicAdar]]) —
    * wedge-enumerated candidates, output bounded by TakeOrdered.
    */
  def qAdamicAdar(s: SparkSession, d: String): DataFrame =
    graft.ops.LinkPredict.adamicAdar(coPurchaseServed(s, d), k = 20)

  val qAdamicAdarSql: String =
    s"""WITH $coPurchaseEdgesSql,
       |${graft.ops.LinkPredict.adamicAdarOracleSql(k = 20)}
       |SELECT id_a, id_b, common, aa_score, ra_score, jaccard
       |FROM linkpred""".stripMargin

  // ---------------------------------------------------------------
  // q_ess — effective sample size of value-weighted events
  // ---------------------------------------------------------------

  /** Kish effective sample size per event type under value weights —
    * the design-effect readout for every weighted-sampling mixture
    * (q_weighted_sample / q_neyman family): ESS = (Σw)²/Σw² with
    * exact micro-unit integer weights, one double division, plus the
    * ess/n efficiency ratio.
    */
  def qEss(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 0)
    Tables.events(s, d)
      .select(col("event_type").as("g"),
        round(col("value") * 1000000.0).cast(dec).as("w"))
      .groupBy(col("g"))
      .agg(count(lit(1)).cast(dec).as("n"), sum(col("w")).as("sw"),
        sum(col("w") * col("w")).as("sww"))
      .select(col("g"), col("n").cast(LongType).as("n"),
        round((col("sw") * col("sw")).cast(DoubleType) /
          col("sww").cast(DoubleType), 6).as("ess"),
        round((col("sw") * col("sw")).cast(DoubleType) /
          col("sww").cast(DoubleType) / col("n").cast(DoubleType), 6)
          .as("ess_ratio"))
  }

  val qEssSql: String =
    """WITH m AS (
      |  SELECT event_type AS g, cast(count(*) as decimal(38,0)) AS n,
      |    cast(sum(cast(round(value * 1000000.0) as decimal(38,0)))
      |      as decimal(38,0)) AS sw,
      |    cast(sum(cast(round(value * 1000000.0) as decimal(38,0)) *
      |      cast(round(value * 1000000.0) as decimal(38,0)))
      |      as decimal(38,0)) AS sww
      |  FROM events GROUP BY 1)
      |SELECT g, cast(n as bigint) AS n,
      |  round(cast(sw * sw as double) / cast(sww as double), 6) AS ess,
      |  round(cast(sw * sw as double) / cast(sww as double) /
      |    cast(n as double), 6) AS ess_ratio
      |FROM m""".stripMargin

  // ---------------------------------------------------------------
  // q_trimmed_mean — 10%-trimmed order value per nation
  // ---------------------------------------------------------------

  /** 10%-per-side trimmed mean of order value (cents) per nation —
    * the robust location estimate next to q_median_ci and q_gini on
    * the same revenue frame: per-group rank window (the medianCi
    * shape), keep ranks (l, n−l], one exact division.
    */
  def qTrimmedMean(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val src = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("grp"),
        round(col("o_totalprice") * 100).cast(LongType).as("x"),
        col("o_orderkey").as("tie"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("x").asc, col("tie").asc)
    src
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))))
      .withColumn("l", expr("n div 10"))
      .filter(col("rk") > col("l") && col("rk") <= col("n") - col("l"))
      .groupBy(col("grp"))
      .agg(max(col("n")).cast(LongType).as("n"),
        count(lit(1)).as("n_kept"),
        round(sum(col("x").cast(dec)).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), 6).as("trimmed_mean_cents"))
  }

  val qTrimmedMeanSql: String =
    """WITH src AS (
      |  SELECT n_name AS grp,
      |    cast(round(o_totalprice * 100) as bigint) AS x,
      |    o_orderkey AS tie
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |rk AS (
      |  SELECT grp, x,
      |    row_number() OVER (PARTITION BY grp ORDER BY x ASC, tie ASC)
      |      AS rk,
      |    count(*) OVER (PARTITION BY grp) AS n
      |  FROM src)
      |SELECT grp, cast(max(n) as bigint) AS n,
      |  cast(count(*) as bigint) AS n_kept,
      |  round(cast(sum(cast(x as decimal(38,0))) as double) /
      |    cast(count(*) as double), 6) AS trimmed_mean_cents
      |FROM rk WHERE rk > n // 10 AND rk <= n - n // 10
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q_jsd — Jensen–Shannon divergence between corpus halves
  // ---------------------------------------------------------------

  /** Jensen–Shannon divergence (bits) between the token
    * distributions of the even and odd document halves — the
    * bounded, symmetric distribution-shift readout (0 = identical,
    * 1 = disjoint) used to compare corpus snapshots / domain mixes;
    * the metric q_drift's PSI approximates and q_dsir's importance
    * weights integrate over. Per-token contributions quantize to
    * integer nano-bits (the q_mutual_info cell discipline) so the
    * cross-token sum is partition-order-free. Scale shape: one token
    * count aggregate per side, margins, a token-sized join, a scalar
    * sum.
    */
  def qJsd(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = docs
      .select((col("doc_id") % 2 === 0).as("even"),
        explode(graft.text.TextAnalysis.tokens(col("text"))).as("tok"))
    val byTok = toks.groupBy(col("tok"))
      .agg(sum(when(col("even"), 1L).otherwise(0L)).as("c0"),
        sum(when(!col("even"), 1L).otherwise(0L)).as("c1"))
    val n = byTok.agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"))
    def dd(c: Column): Column = c.cast(DoubleType)
    val p = dd(col("c0")) / dd(col("n0"))
    val q = dd(col("c1")) / dd(col("n1"))
    val m = (p + q) / 2.0
    val contrib =
      (when(col("c0") > 0L, p * log2(p / m)).otherwise(lit(0.0)) +
        when(col("c1") > 0L, q * log2(q / m)).otherwise(lit(0.0))) * 0.5
    val cells = byTok.crossJoin(broadcast(n))
      .select(round(contrib * 1000000000.0).cast(LongType).as("nb"))
    cells.agg(count(lit(1)).as("n_tokens"),
        sum(col("nb")).as("t"))
      .crossJoin(broadcast(n))
      .select(col("n_tokens"), col("n0"), col("n1"),
        round(col("t").cast(DoubleType) / 1000000000.0, 6).as("jsd_bits"))
  }

  val qJsdSql: String =
    s"""WITH t AS (
       |  SELECT doc_id % 2 = 0 AS even, $toksSql AS toks FROM documents),
       |u AS (SELECT even, unnest(toks) AS tok FROM t),
       |bytok AS (
       |  SELECT tok,
       |    cast(sum(CASE WHEN even THEN 1 ELSE 0 END) as bigint) AS c0,
       |    cast(sum(CASE WHEN NOT even THEN 1 ELSE 0 END) as bigint) AS c1
       |  FROM u GROUP BY 1),
       |nn AS (SELECT cast(sum(c0) as bigint) AS n0,
       |              cast(sum(c1) as bigint) AS n1 FROM bytok),
       |cells AS (
       |  SELECT cast(round((
       |      CASE WHEN c0 > 0 THEN
       |        (cast(c0 as double) / cast(n0 as double)) *
       |        log2((cast(c0 as double) / cast(n0 as double)) /
       |          ((cast(c0 as double) / cast(n0 as double) +
       |            cast(c1 as double) / cast(n1 as double)) / 2.0))
       |      ELSE 0.0 END +
       |      CASE WHEN c1 > 0 THEN
       |        (cast(c1 as double) / cast(n1 as double)) *
       |        log2((cast(c1 as double) / cast(n1 as double)) /
       |          ((cast(c0 as double) / cast(n0 as double) +
       |            cast(c1 as double) / cast(n1 as double)) / 2.0))
       |      ELSE 0.0 END) * 0.5 * 1000000000.0) as bigint) AS nb
       |  FROM bytok CROSS JOIN nn)
       |SELECT cast(count(*) as bigint) AS n_tokens,
       |  (SELECT n0 FROM nn) AS n0, (SELECT n1 FROM nn) AS n1,
       |  round(cast(sum(nb) as double) / 1000000000.0, 6) AS jsd_bits
       |FROM cells""".stripMargin

  private[queries] val stats2Entries
      : Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("q_welch_t", qWelchT _, Some(qWelchTSql)),
      ("q_mann_whitney", qMannWhitney _, Some(qMannWhitneySql)),
      ("q_anova", qAnova _, Some(qAnovaSql)),
      ("q_kruskal", qKruskal _, Some(qKruskalSql)),
      ("q_brown_forsythe", qBrownForsythe _, Some(qBrownForsytheSql)),
      ("q_spearman", qSpearman _, Some(qSpearmanSql)),
      ("q_mann_kendall", qMannKendall _, Some(qMannKendallSql)),
      ("q_theil_sen", qTheilSen _, Some(qTheilSenSql)),
      ("q_acf", qAcf _, Some(qAcfSql)),
      ("q_adamic_adar", qAdamicAdar _, Some(qAdamicAdarSql)),
      ("q_ess", qEss _, Some(qEssSql)),
      ("q_trimmed_mean", qTrimmedMean _, Some(qTrimmedMeanSql)),
      ("q_jsd", qJsd _, Some(qJsdSql)))
}
