package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-14 statistical / mining extensions: grouped OLS, Gini
  * concentration, Kaplan–Meier survival, sequential 2-patterns,
  * difference-in-differences, Fellegi–Sunter record linkage, and the
  * HyperBall HLL neighborhood function. Each pairs a Spark-first
  * operator (graft.ops / graft.sketch) with an
  * operation-for-operation DuckDB replay.
  */
private[queries] trait StatsExtQueries extends KnnReleaseQueries {

  // ---------------------------------------------------------------
  // q_ols_group — per-returnflag OLS of extended price on quantity
  // ---------------------------------------------------------------

  /** Grouped least-squares trend: price-on-quantity fit per return
    * flag — slope/intercept/r² from one exact-integer moment
    * aggregate (graft.ops.Regression's closed forms).
    */
  def qOlsGroup(s: SparkSession, d: String): DataFrame =
    graft.ops.Regression.olsByGroup(
      Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
        round(col("l_quantity") * 100).cast(LongType).as("x"),
        round(col("l_extendedprice") * 100).cast(LongType).as("y")),
      Seq("flag"), col("x"), col("y"))

  val qOlsGroupSql: String =
    s"""WITH src AS (
       |  SELECT l_returnflag AS flag,
       |    cast(round(l_quantity * 100) as bigint) AS x,
       |    cast(round(l_extendedprice * 100) as bigint) AS y
       |  FROM lineitem),
       |${graft.ops.Regression.olsOracleSql("src", Seq("flag"))}
       |SELECT flag, n, slope, intercept, r2 FROM ols""".stripMargin

  // ---------------------------------------------------------------
  // q_gini — per-nation Gini concentration of order revenue
  // ---------------------------------------------------------------

  /** Revenue-concentration audit: the per-nation Gini coefficient of
    * order totals (graft.ops.Inequality) — "is this market served by
    * a few whale orders?", the corpus analogue being domain
    * concentration before a training mix is balanced.
    */
  def qGini(s: SparkSession, d: String): DataFrame = {
    val src = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("grp"),
        round(col("o_totalprice") * 100).cast(LongType).as("x"),
        col("o_orderkey").as("tie"))
    graft.ops.Inequality.gini(src, Seq("grp"), col("x"), col("tie"))
  }

  val qGiniSql: String =
    s"""WITH src AS (
       |  SELECT n_name AS grp,
       |    cast(round(o_totalprice * 100) as bigint) AS x,
       |    o_orderkey AS tie
       |  FROM orders
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey),
       |${graft.ops.Inequality.giniOracleSql("src", Seq("grp"))}
       |SELECT grp, n, total, gini FROM gini""".stripMargin

  /** Distribution-free per-nation median order value with the
    * order-statistic ~95 % CI ([[graft.ops.OrderStats.medianCi]]) —
    * the robust companion to q_gini's concentration readout over the
    * same revenue frame.
    */
  def qMedianCi(s: SparkSession, d: String): DataFrame = {
    val src = Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("grp"),
        round(col("o_totalprice") * 100).cast(LongType).as("x"),
        col("o_orderkey").as("tie"))
    graft.ops.OrderStats.medianCi(src, Seq("grp"), col("x"), col("tie"))
  }

  val qMedianCiSql: String =
    s"""WITH src AS (
       |  SELECT n_name AS grp,
       |    cast(round(o_totalprice * 100) as bigint) AS x,
       |    o_orderkey AS tie
       |  FROM orders
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey),
       |${graft.ops.OrderStats.medianCiOracleSql("src", Seq("grp"))}
       |SELECT grp, n, median, ci_lo, ci_hi FROM medci""".stripMargin

  /** Split-conformal calibration of the quality classifier
    * ([[graft.ops.OrderStats.conformal]]): nonconformity = |y − score|
    * in integer micro-units, calibration/test split on the shared
    * hash coordinate, threshold = the exact ⌈(n+1)·0.9⌉-th order
    * statistic (range-sharded rank, no global window), plus the
    * test-split coverage the conformal guarantee promises ≥ 0.9 in
    * expectation.
    */
  def qConformal(s: SparkSession, d: String): DataFrame = {
    val scored = graft.text.QualityClassifier.fitScore(
      Tables.documents(s, d), col("text"),
      (graft.text.TextAnalysis.qualityScore(col("text")) >= 0.65)
        .cast(IntegerType),
      keep = Seq(col("doc_id")))
    val u = graft.ops.Sampling.coordinate(col("doc_id"))
    graft.ops.OrderStats.conformal(
      scored.select(col("doc_id"),
        round(abs(col("y").cast(DoubleType) - col("score")) * 1e6)
          .cast(LongType).as("nc"),
        (u < 0.5).as("cal")),
      col("nc"), col("cal"), col("doc_id"))
  }

  lazy val qConformalSql: String = {
    val u = graft.ops.Sampling.coordinateSql("doc_id")
    s"""WITH clf AS (
       |$qClassifierSql),
       |src AS (
       |  SELECT doc_id AS tie,
       |    cast(round(abs(cast(y as double) - score) * 1000000) as bigint)
       |      AS nc,
       |    $u < 0.5 AS cal
       |  FROM clf),
       |${graft.ops.OrderStats.conformalOracleSql("src")}
       |SELECT n_calib, k, q_hat, n_test, covered, coverage FROM conf"""
      .stripMargin
  }

  // ---------------------------------------------------------------
  // q_kaplan_meier — per-cohort KM survival over user lifetimes
  // ---------------------------------------------------------------

  /** Time-to-conversion survival per acquisition cohort (cohort =
    * the user's FIRST event type): the "event" is the user's first
    * BIG purchase (value ≥ 75 — roughly the top quartile of purchase
    * values), duration in days from their first event; users who
    * never convert are right-censored at their LAST event. This is
    * the mix a survival estimator exists for — at sf0.1, 1,438
    * conversions against 62 censored — where a plain retention curve
    * would count every still-shopping user as lost. Date-grained
    * end-to-end — day truncation is identical across engines
    * regardless of the parquet timestamp precision. See
    * [[graft.ops.Survival]] for the quantized-product determinism
    * contract.
    */
  def qKaplanMeier(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val per = ev
      .withColumn("cohort", first(col("event_type")).over(w))
      .groupBy(col("user_id"), col("cohort"))
      .agg(min(to_date(col("ts"))).as("mn"), max(to_date(col("ts"))).as("mx"),
        min(when(col("event_type") === "purchase" && col("value") >= 75.0,
          to_date(col("ts")))).as("fp"))
    val durs = per.select(col("cohort"),
      datediff(coalesce(col("fp"), col("mx")), col("mn"))
        .cast(LongType).as("dur"),
      col("fp").isNotNull.as("observed"))
    graft.ops.Survival.kaplanMeier(durs, "cohort", "dur", "observed")
  }

  val qKaplanMeierSql: String =
    """WITH firsts AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS rn
      |  FROM events),
      |coh AS (SELECT user_id, event_type AS cohort FROM firsts WHERE rn = 1),
      |spans AS (
      |  SELECT user_id, cast(min(ts) as date) AS mn,
      |    cast(max(ts) as date) AS mx,
      |    cast(min(CASE WHEN event_type = 'purchase' AND value >= 75.0
      |      THEN ts END) as date) AS fp
      |  FROM events GROUP BY 1),
      |per AS (
      |  SELECT s.user_id, c.cohort, s.mn, s.mx, s.fp
      |  FROM spans s JOIN coh c USING (user_id)),
      |durs AS (
      |  SELECT cohort, date_diff('day', mn, coalesce(fp, mx)) AS dur,
      |    fp IS NOT NULL AS observed
      |  FROM per),
      |lt AS (
      |  SELECT cohort, cast(dur as bigint) AS t,
      |    cast(sum(CASE WHEN observed THEN 1 ELSE 0 END) as bigint) AS d,
      |    cast(sum(CASE WHEN observed THEN 0 ELSE 1 END) as bigint) AS c
      |  FROM durs GROUP BY 1, 2),
      |risk AS (
      |  SELECT cohort, t, d, c,
      |    cast(sum(d + c) OVER (PARTITION BY cohort ORDER BY t DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint)
      |      AS n_risk
      |  FROM lt),
      |-- the KM product replays the PPM fold on (n, n−d) pairs packed
      |-- into one bigint (n·2³¹ + (n−d), exact in a double for
      |-- n < 2²² — oracle-side bound only; the engine folds structs).
      |-- Unpacking uses explicit floor(): DuckDB's // and % on
      |-- DOUBLEs lose the floor inside lambda bodies (measured:
      |-- x // 2³¹ evaluated as plain division there), which shifted
      |-- one tie-breaking .5 by 2e-10 and flipped the round
      |packed AS (
      |  SELECT cohort, t, d, c, n_risk,
      |    n_risk * 2147483648 + (n_risk - d) AS e,
      |    row_number() OVER (PARTITION BY cohort ORDER BY t) AS pos
      |  FROM risk),
      |lists AS (
      |  SELECT cohort, list(e ORDER BY t) AS vs FROM packed GROUP BY 1)
      |SELECT p.cohort, p.t, p.n_risk, p.d, p.c,
      |  round(list_reduce(
      |    list_prepend(cast(1000000 as double),
      |      cast(list_slice(l.vs, 1, p.pos) as double[])),
      |    (acc, e) -> round(acc *
      |      (e - floor(e / 2147483648) * 2147483648) /
      |      floor(e / 2147483648)))
      |    / 1000000, 6) AS surv
      |FROM packed p JOIN lists l USING (cohort)""".stripMargin

  /** Two-arm log-rank test over the SAME time-to-conversion
    * durations as [[qKaplanMeier]], arms split by user parity (the
    * q_cuped / q_did variant convention): do the two arms convert on
    * the same survival curve? See [[graft.ops.Survival.logRank]].
    */
  def qLogrank(s: SparkSession, d: String): DataFrame = {
    val per = Tables.events(s, d).groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("mn"), max(to_date(col("ts"))).as("mx"),
        min(when(col("event_type") === "purchase" && col("value") >= 75.0,
          to_date(col("ts")))).as("fp"))
    val durs = per.select((col("user_id") % 2 === 1).as("arm"),
      datediff(coalesce(col("fp"), col("mx")), col("mn"))
        .cast(LongType).as("dur"),
      col("fp").isNotNull.as("observed"))
    graft.ops.Survival.logRank(durs, "arm", "dur", "observed")
  }

  val qLogrankSql: String =
    s"""WITH spans AS (
       |  SELECT user_id, cast(min(ts) as date) AS mn,
       |    cast(max(ts) as date) AS mx,
       |    cast(min(CASE WHEN event_type = 'purchase' AND value >= 75.0
       |      THEN ts END) as date) AS fp
       |  FROM events GROUP BY 1),
       |durs AS (
       |  SELECT user_id % 2 = 1 AS arm,
       |    date_diff('day', mn, coalesce(fp, mx)) AS dur,
       |    fp IS NOT NULL AS observed
       |  FROM spans),
       |${graft.ops.Survival.logRankOracleSql("durs")}
       |SELECT o1, o2, e1, e2, v, chi2 FROM logrank""".stripMargin

  // ---------------------------------------------------------------
  // q_seq2 — gap-allowed sequential 2-patterns over user journeys
  // ---------------------------------------------------------------

  /** Sequential pattern support: which event type RELIABLY precedes
    * which (any gap) across users — see [[graft.ops.SeqMining]] for
    * the min/max-span linearization.
    */
  def qSeq2(s: SparkSession, d: String): DataFrame =
    graft.ops.SeqMining.patterns2(Tables.events(s, d),
      "user_id", "ts", "event_type", minSupport = 5L)

  val qSeq2Sql: String =
    s"""WITH src AS (SELECT user_id AS e, event_type AS ty, ts FROM events),
       |${graft.ops.SeqMining.patterns2OracleSql("src", 5L)}
       |SELECT a, b, n_ab, n_a, n_b, n_entities, conf, lift FROM pat"""
      .stripMargin

  /** Length-3 sequential patterns (repeats allowed) with
    * prefix-extension confidence — the PrefixSpan step beyond
    * [[qSeq2]], linearized by the b*-witness trick
    * ([[graft.ops.SeqMining.patterns3]]).
    */
  def qSeq3(s: SparkSession, d: String): DataFrame =
    graft.ops.SeqMining.patterns3(Tables.events(s, d),
      "user_id", "ts", "event_type", minSupport = 5L)

  val qSeq3Sql: String =
    s"""WITH src AS (SELECT user_id AS e, event_type AS ty, ts FROM events),
       |${graft.ops.SeqMining.patterns3OracleSql("src", 5L)}
       |SELECT a, b, c, n_abc, n_ab, conf FROM pat3""".stripMargin

  // ---------------------------------------------------------------
  // q_did — difference-in-differences A/B readout
  // ---------------------------------------------------------------

  /** Two-period DiD over events: variant = user parity, period split
    * at 2024-01-16 (the q_cuped cut); cell means from exact
    * decimal(38,0) cent sums, the DiD contrast computed on the raw
    * double means and round(·,6)-ed once. One scan, one 4-cell
    * aggregate — nothing at corpus scale survives past the first
    * combine.
    */
  def qDid(s: SparkSession, d: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val cut = lit("2024-01-16").cast("timestamp")
    val cells = Tables.events(s, d)
      .select((col("user_id") % 2 === 1).as("treat"),
        (col("ts") >= cut).as("post"),
        round(col("value") * 100).cast(dec).as("q"))
      .groupBy(col("treat"), col("post"))
      .agg(count(lit(1)).cast(dec).as("n"), sum(col("q")).as("sq"))
      .select(col("treat"), col("post"),
        (col("sq").cast(DoubleType) / col("n").cast(DoubleType)).as("mean"),
        col("n").cast(LongType).as("n"))
    val wide = cells.groupBy()
      .agg(
        max(when(col("treat") && col("post"), col("mean"))).as("m_t_post"),
        max(when(col("treat") && !col("post"), col("mean"))).as("m_t_pre"),
        max(when(!col("treat") && col("post"), col("mean"))).as("m_c_post"),
        max(when(!col("treat") && !col("post"), col("mean"))).as("m_c_pre"),
        sum(when(col("treat") && col("post"), col("n"))).as("n_t_post"),
        sum(when(col("treat") && !col("post"), col("n"))).as("n_t_pre"),
        sum(when(!col("treat") && col("post"), col("n"))).as("n_c_post"),
        sum(when(!col("treat") && !col("post"), col("n"))).as("n_c_pre"))
    wide.select(
      col("n_c_pre"), col("n_c_post"), col("n_t_pre"), col("n_t_post"),
      round(col("m_c_pre"), 6).as("mean_c_pre"),
      round(col("m_c_post"), 6).as("mean_c_post"),
      round(col("m_t_pre"), 6).as("mean_t_pre"),
      round(col("m_t_post"), 6).as("mean_t_post"),
      round((col("m_t_post") - col("m_t_pre")) -
        (col("m_c_post") - col("m_c_pre")), 6).as("did"))
  }

  val qDidSql: String =
    """WITH cells AS (
      |  SELECT user_id % 2 = 1 AS treat,
      |    ts >= TIMESTAMP '2024-01-16' AS post,
      |    cast(count(*) as bigint) AS n,
      |    cast(sum(cast(round(value * 100) as decimal(38,0))) as double) /
      |      cast(count(*) as double) AS mean
      |  FROM events GROUP BY 1, 2),
      |wide AS (
      |  SELECT
      |    max(CASE WHEN treat AND post THEN mean END) AS m_t_post,
      |    max(CASE WHEN treat AND NOT post THEN mean END) AS m_t_pre,
      |    max(CASE WHEN NOT treat AND post THEN mean END) AS m_c_post,
      |    max(CASE WHEN NOT treat AND NOT post THEN mean END) AS m_c_pre,
      |    sum(CASE WHEN treat AND post THEN n END) AS n_t_post,
      |    sum(CASE WHEN treat AND NOT post THEN n END) AS n_t_pre,
      |    sum(CASE WHEN NOT treat AND post THEN n END) AS n_c_post,
      |    sum(CASE WHEN NOT treat AND NOT post THEN n END) AS n_c_pre
      |  FROM cells)
      |SELECT cast(n_c_pre as bigint) AS n_c_pre,
      |  cast(n_c_post as bigint) AS n_c_post,
      |  cast(n_t_pre as bigint) AS n_t_pre,
      |  cast(n_t_post as bigint) AS n_t_post,
      |  round(m_c_pre, 6) AS mean_c_pre, round(m_c_post, 6) AS mean_c_post,
      |  round(m_t_pre, 6) AS mean_t_pre, round(m_t_post, 6) AS mean_t_post,
      |  round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6) AS did
      |FROM wide""".stripMargin

  // ---------------------------------------------------------------
  // q_linkage — Fellegi–Sunter probabilistic record linkage
  // ---------------------------------------------------------------

  private val linkageFields = Seq("lang", "source", "mid")
  private val linkageM = Map("lang" -> 0.95, "source" -> 0.7, "mid" -> 0.9)
  private val linkageMin = 6.0

  /** Probabilistic linkage over the documents table: candidate pairs
    * blocked on (12-char text prefix, length band) — bounded by
    * planted-duplicate cluster size, the LSH-band discipline — and
    * scored by [[graft.ops.Linkage]]'s corpus-estimated log₂
    * agreement weights on (lang, source, mid-text shingle).
    */
  def qLinkage(s: SparkSession, d: String): DataFrame =
    graft.ops.Linkage.fellegiSunter(
      Tables.documents(s, d).select(col("doc_id").as("id"),
        substring(col("text"), 1, 12).as("bl_prefix"),
        expr("n_chars div 100").as("bl_band"),
        col("lang"), col("source"),
        substring(col("text"), 41, 12).as("mid")),
      "id", Seq("bl_prefix", "bl_band"), linkageFields, linkageM, linkageMin)

  val qLinkageSql: String =
    s"""WITH src AS (
       |  SELECT doc_id AS id, substr(text, 1, 12) AS bl_prefix,
       |    n_chars // 100 AS bl_band, lang, source,
       |    substr(text, 41, 12) AS mid
       |  FROM documents),
       |${graft.ops.Linkage.oracleSql("src", Seq("bl_prefix", "bl_band"),
          linkageFields, linkageM, linkageMin)}
       |SELECT id_a, id_b, agree_lang, agree_source, agree_mid, score
       |FROM linked""".stripMargin

  /** Sampled twin of [[qLinkage]] for the sf1 oracle gate: the same
    * Fellegi–Sunter scoring over the 1/9 of pairs whose BOTH ids are
    * ≡ 0 (mod 3) — each block shrinks ~3×, the quadratic pair CTE
    * ~9×, so the oracle replays at scale factors where the full pair
    * output is out of reach. The u-probabilities are re-estimated on
    * the sampled corpus (the sampled query is self-consistent, not a
    * row-filter of the full one). Runs at every SF.
    */
  def qLinkageSample(s: SparkSession, d: String): DataFrame =
    graft.ops.Linkage.fellegiSunter(
      Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("id"),
          substring(col("text"), 1, 12).as("bl_prefix"),
          expr("n_chars div 100").as("bl_band"),
          col("lang"), col("source"),
          substring(col("text"), 41, 12).as("mid")),
      "id", Seq("bl_prefix", "bl_band"), linkageFields, linkageM, linkageMin)

  val qLinkageSampleSql: String =
    s"""WITH src AS (
       |  SELECT doc_id AS id, substr(text, 1, 12) AS bl_prefix,
       |    n_chars // 100 AS bl_band, lang, source,
       |    substr(text, 41, 12) AS mid
       |  FROM documents WHERE doc_id % 3 = 0),
       |${graft.ops.Linkage.oracleSql("src", Seq("bl_prefix", "bl_band"),
          linkageFields, linkageM, linkageMin)}
       |SELECT id_a, id_b, agree_lang, agree_source, agree_mid, score
       |FROM linked""".stripMargin

  // ---------------------------------------------------------------
  // q_hyperball — HLL neighborhood function on the co-purchase graph
  // ---------------------------------------------------------------

  private val hyperballB = 5
  private val hyperballRounds = 3

  /** Ensure-and-read of the PERSISTED per-node ball-estimate table
    * (id, r, est_i), id-bucketed: the register propagation — the
    * expensive part, each round shuffles ≤ m·|E| rows — runs once per
    * corpus version; both HyperBall readouts (hop plot, harmonic
    * centrality) serve from it. Fingerprint basis = the SAME source
    * lineitem slice as the co-purchase adjacency (the estimates are a
    * pure function of it), so a warm ensure costs one narrow source
    * scan.
    */
  private def hyperballServed(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 4 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val table = "graft_hyperball_balls_" + d.replaceAll("[^A-Za-z0-9]", "_")
    // logicV 2: r15 changed the DERIVATION (small-range linear-counting
    // correction + dst-seeding) without touching the source data — a
    // persistent metastore would have kept serving pre-correction
    // est_i under a matching fp_n/fp_h (ADVICE r15)
    graft.dedup.IncrementalDedup.ensureBucketedState(
      li, "l_orderkey", "l_partkey", table, nBuckets = 8,
      bucketCols = Seq("id"), sortCols = Seq("id"), logicV = 2) {
      val edges = coPurchaseServed(s, d)
      val nodes = edges.select(col("src").as("id")).distinct()
      graft.sketch.HyperBall.ballEstimatesInt(nodes, edges,
        rounds = hyperballRounds, b = hyperballB)
    }
    s.table(table)
  }

  /** Hop plot of the co-purchase part graph via HyperBall
    * ([[graft.sketch.HyperBall]]): per radius r = 0..3, the estimated
    * mean ball size over ALL nodes — all-pairs reachability structure
    * for the cost of r register-merge rounds, where the exact answer
    * is an N× BFS. b = 5 (32 registers): hop plots aggregate across
    * ~N nodes, so the per-node ±18 % concentrates out, and the
    * register fan-out stays bounded at 32×|E|. Served from
    * [[hyperballServed]]; this query carries the cold build.
    */
  def qHyperball(s: SparkSession, d: String): DataFrame =
    graft.sketch.HyperBall.hopPlot(hyperballServed(s, d))

  val qHyperballSql: String =
    s"""WITH $coPurchaseEdgesSql,
       |${graft.sketch.HyperBall.hopPlotOracleSql(rounds = hyperballRounds,
          b = hyperballB)}
       |SELECT r, n_nodes, total_reach, avg_reach FROM hop""".stripMargin

  /** Harmonic centrality (Boldi & Vigna 2014) for every node of the
    * co-purchase graph, top-20 — shell-weighted reach Σ Δball(r)/r
    * read from the SAME persisted register propagation as the hop
    * plot (zero additional graph work: one id-bucketed scan, a
    * groupBy(id) that rides the bucketing shuffle-free, and a
    * TakeOrdered(20)).
    */
  def qHarmonicCentrality(s: SparkSession, d: String): DataFrame =
    graft.sketch.HyperBall.harmonicCentrality(hyperballServed(s, d),
      rounds = hyperballRounds, k = 20)

  val qHarmonicCentralitySql: String =
    s"""WITH $coPurchaseEdgesSql,
       |${graft.sketch.HyperBall.harmonicCentralityOracleSql(
          rounds = hyperballRounds, b = hyperballB, k = 20)}
       |SELECT id, est0, est1, est2, est3, centrality FROM central"""
      .stripMargin

  /** Isotonic calibration (PAV, [[graft.ops.Isotonic]]) of the
    * learned quality classifier's reliability bins — the fit a
    * production calibrator applies on top of q_calibration's
    * diagnostic: per score decile, the raw positive rate and the
    * closest non-decreasing (weighted-L²) fitted rate. Binning is
    * q_calibration's one corpus aggregate; the PAV rounds run on the
    * ≤10-row bin table in pure integer arithmetic.
    */
  def qIsotonic(s: SparkSession, d: String): DataFrame = {
    val scored = graft.text.QualityClassifier.fitScore(
      Tables.documents(s, d), col("text"),
      (graft.text.TextAnalysis.qualityScore(col("text")) >= 0.65)
        .cast(IntegerType),
      keep = Seq(col("doc_id")))
    val bins = scored
      .withColumn("bin", least(floor(col("score") * 10), lit(9.0))
        .cast(LongType))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y").cast(LongType)).as("n_pos"))
    graft.ops.Isotonic.pavBins(bins, "bin", "n", "n_pos", maxBins = 10)
      .withColumn("raw_rate",
        round(col("s").cast(DoubleType) / col("w").cast(DoubleType), 6))
  }

  lazy val qIsotonicSql: String =
    s"""WITH clf AS (
       |$qClassifierSql),
       |bins AS (
       |  SELECT cast(least(floor(score * 10), 9) as bigint) AS lo,
       |    count(*) AS w, cast(sum(y) as bigint) AS s
       |  FROM clf GROUP BY 1),
       |${graft.ops.Isotonic.pavOracleSql(maxBins = 10)}
       |SELECT bin, w, s, pool_lo, iso_rate,
       |  round(cast(s as double) / cast(w as double), 6) AS raw_rate
       |FROM pav""".stripMargin

  /** HyperBall accuracy readout (the q_ann_recall/q_knn_recall
    * discipline applied to the graph sketch): per radius, the EXACT
    * mean ball size over a fixed 1/101 hash sample of nodes — a
    * (seed, node) pair BFS, linear in seeds — against the HLL
    * estimate for the SAME seeds read from the persisted store. The
    * published ratio is the measured register-sketch error at b = 5;
    * the exact side exists only at measurement scale, never as the
    * production path. Small balls (r ≤ 1) read through the IN-ENGINE
    * linear-counting correction ([[graft.sketch.HyperBall
    * .ballEstimatesInt]] — shared literal table, no libm), so the
    * r = 0 ratio is exactly 1.0 and r = 1 sits near 1 instead of the
    * former raw-HLL ~0.7·m floor; r = 2..3 stay within the 1.04/√m
    * band (1.018 / 0.976 at sf0.1 pre-correction).
    */
  def qHyperballRecall(s: SparkSession, d: String): DataFrame = {
    val edges = coPurchaseServed(s, d)
    val seeds = edges.select(col("src").as("id")).distinct()
      .filter(col("id") % 101 === 0)
    val exact = graft.sketch.HyperBall.exactBallSizes(seeds, edges,
      rounds = hyperballRounds)
      .groupBy(col("r"))
      .agg(count(lit(1)).as("n_seeds"),
        sum(col("n_exact")).as("exact_total"))
    val est = hyperballServed(s, d)
      .filter(col("id") % 101 === 0)
      .groupBy(col("r")).agg(sum(col("est_i")).as("est_total"))
    exact.join(est, Seq("r"))
      .select(col("r"), col("n_seeds"), col("exact_total"), col("est_total"),
        round(col("est_total").cast(DoubleType) /
          col("exact_total").cast(DoubleType), 6).as("est_ratio"))
  }

  val qHyperballRecallSql: String =
    s"""WITH $coPurchaseEdgesSql,
       |seeds AS (SELECT id FROM nodes WHERE id % 101 = 0),
       |${graft.sketch.HyperBall.exactBallSizesOracleSql(hyperballRounds)},
       |${graft.sketch.HyperBall.ballEstimatesOracleSql(hyperballRounds,
          hyperballB)},
       |ex AS (
       |  SELECT r, cast(count(*) as bigint) AS n_seeds,
       |    cast(sum(n_exact) as bigint) AS exact_total
       |  FROM exact GROUP BY 1),
       |es AS (
       |  SELECT r, cast(sum(est_i) as bigint) AS est_total
       |  FROM allr WHERE id % 101 = 0 GROUP BY 1)
       |SELECT r, n_seeds, exact_total, est_total,
       |  round(cast(est_total as double) / cast(exact_total as double), 6)
       |    AS est_ratio
       |FROM ex JOIN es USING (r)""".stripMargin

  private[queries] val statsExtEntries
      : Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    Seq(
      ("q_ols_group", qOlsGroup _, Some(qOlsGroupSql)),
      ("q_gini", qGini _, Some(qGiniSql)),
      ("q_median_ci", qMedianCi _, Some(qMedianCiSql)),
      ("q_conformal", qConformal _, Some(qConformalSql)),
      ("q_kaplan_meier", qKaplanMeier _, Some(qKaplanMeierSql)),
      ("q_logrank", qLogrank _, Some(qLogrankSql)),
      ("q_seq2", qSeq2 _, Some(qSeq2Sql)),
      ("q_seq3", qSeq3 _, Some(qSeq3Sql)),
      ("q_did", qDid _, Some(qDidSql)),
      ("q_linkage", qLinkage _, Some(qLinkageSql)),
      ("q_linkage_sample", qLinkageSample _, Some(qLinkageSampleSql)),
      ("q_hyperball", qHyperball _, Some(qHyperballSql)),
      ("q_harmonic_centrality", qHarmonicCentrality _,
        Some(qHarmonicCentralitySql)),
      ("q_hyperball_recall", qHyperballRecall _, Some(qHyperballRecallSql)),
      ("q_isotonic", qIsotonic _, Some(qIsotonicSql)))
}
