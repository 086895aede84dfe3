package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Two-sample and k-sample hypothesis tests from exact integer
  * moments — the experiment-readout family (is cohort A's metric
  * different from B's?) computed with the repo's cross-engine
  * determinism discipline ([[Regression]] / q_cuped contract):
  *
  *  - inputs quantize to integer units; every sum accumulates in
  *    DECIMAL(38,0) (order-independent, overflow-checked);
  *  - each published statistic is a fixed dag of IEEE double ops
  *    (div/mult/sqrt are correctly-rounded per IEEE 754, so identical
  *    inputs give identical bits in any engine) over those exact
  *    terms, round(·,6)-ed once at the end;
  *  - rank statistics avoid per-row windows: ranks aggregate BY VALUE
  *    first (the quantized domain is bounded — ~50 distinct
  *    quantities, not ~6·10⁵ rows), so the only window runs over the
  *    value-cardinality table — the "≤256-row bounded frame" class
  *    every plan audit whitelists.
  *
  * Scale shape: one map-side-combining hash aggregate per input
  * (moments or value counts), then scalar finalization. At 100 TB
  * each test is a full-scan aggregate plus O(1) arithmetic.
  */
object HypoTests {

  /** Welch's unequal-variance t-test between the rows where `isA`
    * and the rest, on integer-quantized `xInt`. One row:
    * (n_a, n_b, mean_a, mean_b, t_stat, df_ws) — means and the
    * Welch–Satterthwaite df rounded to 6.
    */
  def welchT(df: DataFrame, isA: Column, xInt: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val m = df
      .select(isA.as("a"), xInt.cast(dec).as("x"))
      .groupBy(col("a"))
      .agg(count(lit(1)).cast(dec).as("n"), sum(col("x")).as("s"),
        sum(col("x") * col("x")).as("q"))
    // pivot the two cohort moment rows into one — scalar finalization,
    // no cross-row double sums anywhere
    val w = m.agg(
      max(when(col("a"), col("n"))).as("na"),
      max(when(col("a"), col("s"))).as("sa"),
      max(when(col("a"), col("q"))).as("qa"),
      max(when(!col("a"), col("n"))).as("nb"),
      max(when(!col("a"), col("s"))).as("sb"),
      max(when(!col("a"), col("q"))).as("qb"))
    def d(c: String): Column = col(c).cast(DoubleType)
    // sample variance via the exact moment identity: the NUMERATOR
    // n·Σx² − (Σx)² is one exact decimal, so v is a single division
    val va = (col("na") * col("qa") - col("sa") * col("sa"))
      .cast(DoubleType) / (col("na") * (col("na") - lit(1).cast(dec)))
      .cast(DoubleType)
    val vb = (col("nb") * col("qb") - col("sb") * col("sb"))
      .cast(DoubleType) / (col("nb") * (col("nb") - lit(1).cast(dec)))
      .cast(DoubleType)
    w.select(col("na").cast(LongType).as("n_a"),
        col("nb").cast(LongType).as("n_b"),
        round(d("sa") / d("na"), 6).as("mean_a"),
        round(d("sb") / d("nb"), 6).as("mean_b"),
        va.as("__va"), vb.as("__vb"),
        (d("sa") / d("na") - d("sb") / d("nb")).as("__dm"),
        d("na").as("__na"), d("nb").as("__nb"))
      .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        round(col("__dm") /
          sqrt(col("__va") / col("__na") + col("__vb") / col("__nb")), 6)
          .as("t_stat"),
        // squares spelled as x*x (not pow): pow's last-bit behavior
        // is libm-specific; mult is IEEE correctly-rounded everywhere
        round(
          ((col("__va") / col("__na") + col("__vb") / col("__nb")) *
            (col("__va") / col("__na") + col("__vb") / col("__nb"))) /
            ((col("__va") / col("__na")) * (col("__va") / col("__na")) /
              (col("__na") - 1.0) +
              (col("__vb") / col("__nb")) * (col("__vb") / col("__nb")) /
                (col("__nb") - 1.0)), 6)
          .as("df_ws"))
  }

  /** DuckDB mirror of [[welchT]] over `src(a BOOLEAN, x BIGINT)`:
    * CTE chain ending in `welch`.
    */
  def welchOracleSql(src: String): String =
    s"""m AS (
       |  SELECT a, cast(count(*) as decimal(38,0)) AS n,
       |    cast(sum(cast(x as decimal(38,0))) as decimal(38,0)) AS s,
       |    cast(sum(cast(x as decimal(38,0)) * cast(x as decimal(38,0)))
       |      as decimal(38,0)) AS q
       |  FROM $src GROUP BY 1),
       |piv AS (
       |  SELECT
       |    max(CASE WHEN a THEN n END) AS na,
       |    max(CASE WHEN a THEN s END) AS sa,
       |    max(CASE WHEN a THEN q END) AS qa,
       |    max(CASE WHEN NOT a THEN n END) AS nb,
       |    max(CASE WHEN NOT a THEN s END) AS sb,
       |    max(CASE WHEN NOT a THEN q END) AS qb
       |  FROM m),
       |terms AS (
       |  SELECT cast(na as bigint) AS n_a, cast(nb as bigint) AS n_b,
       |    round(cast(sa as double) / cast(na as double), 6) AS mean_a,
       |    round(cast(sb as double) / cast(nb as double), 6) AS mean_b,
       |    cast(na * qa - sa * sa as double) /
       |      cast(na * (na - 1) as double) AS va,
       |    cast(nb * qb - sb * sb as double) /
       |      cast(nb * (nb - 1) as double) AS vb,
       |    cast(sa as double) / cast(na as double) -
       |      cast(sb as double) / cast(nb as double) AS dm,
       |    cast(na as double) AS nad, cast(nb as double) AS nbd
       |  FROM piv),
       |welch AS (
       |  SELECT n_a, n_b, mean_a, mean_b,
       |    round(dm / sqrt(va / nad + vb / nbd), 6) AS t_stat,
       |    round(((va / nad + vb / nbd) * (va / nad + vb / nbd)) /
       |      ((va / nad) * (va / nad) / (nad - 1.0) +
       |       (vb / nbd) * (vb / nbd) / (nbd - 1.0)), 6) AS df_ws
       |  FROM terms)""".stripMargin

  /** Mann–Whitney U (Wilcoxon rank-sum) between the rows where `isA`
    * and the rest, on integer `xInt`, with the tie-corrected normal
    * approximation. Half-integer average ranks are carried DOUBLED so
    * every rank quantity stays an exact integer: r1_x2 =
    * Σ_v c1(v)·(2·below(v) + c(v) + 1). One row:
    * (n_a, n_b, u_a_x2, tie_cube, z_stat) where u_a_x2 = 2·U_A and
    * tie_cube = Σ(t³−t).
    */
  def mannWhitney(df: DataFrame, isA: Column, xInt: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val byV = df
      .select(isA.as("a"), xInt.cast(LongType).as("x"))
      .groupBy(col("x"))
      .agg(count(lit(1)).cast(dec).as("c"),
        sum(when(col("a"), 1L).otherwise(0L)).cast(dec).as("c1"))
    // the one window: cumulative count over the VALUE table (bounded
    // by the quantized domain, e.g. 50 quantities), never over rows
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("x").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranked = byV.withColumn("below",
      coalesce(sum(col("c")).over(w), lit(0).cast(dec)))
    val agg = ranked.agg(
      sum(col("c1")).as("n1"),
      sum(col("c") - col("c1")).as("n2"),
      sum(col("c1") * (lit(2).cast(dec) * col("below") + col("c") +
        lit(1).cast(dec))).as("r1x2"),
      sum(col("c") * col("c") * col("c") - col("c")).as("tcube"))
    def d(c: Column): Column = c.cast(DoubleType)
    val u1x2 = col("r1x2") - col("n1") * (col("n1") + lit(1).cast(dec))
    val n = col("n1") + col("n2")
    // σ² = (n1·n2/12)·((n+1) − Σ(t³−t)/(n(n−1))); z from 2U with the
    // doubled mean 2μ = n1·n2 — every input to the double dag exact
    val z = (d(u1x2) - d(col("n1") * col("n2"))) /
      (lit(2.0) * sqrt(d(col("n1") * col("n2")) / lit(12.0) *
        (d(n + lit(1).cast(dec)) -
          d(col("tcube")) / d(n * (n - lit(1).cast(dec))))))
    agg.select(col("n1").cast(LongType).as("n_a"),
      col("n2").cast(LongType).as("n_b"),
      u1x2.cast(LongType).as("u_a_x2"),
      col("tcube").cast(LongType).as("tie_cube"),
      round(z, 6).as("z_stat"))
  }

  /** DuckDB mirror of [[mannWhitney]] over `src(a BOOLEAN, x BIGINT)`:
    * CTE chain ending in `mwu`.
    */
  def mannWhitneyOracleSql(src: String): String =
    s"""byv AS (
       |  SELECT x, cast(count(*) as decimal(38,0)) AS c,
       |    cast(sum(CASE WHEN a THEN 1 ELSE 0 END) as decimal(38,0)) AS c1
       |  FROM $src GROUP BY 1),
       |rankedv AS (
       |  SELECT x, c, c1,
       |    coalesce(sum(c) OVER (ORDER BY x ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      cast(0 as decimal(38,0))) AS below
       |  FROM byv),
       |ag AS (
       |  SELECT sum(c1) AS n1, sum(c - c1) AS n2,
       |    sum(c1 * (2 * below + c + 1)) AS r1x2,
       |    sum(c * c * c - c) AS tcube
       |  FROM rankedv),
       |mwu AS (
       |  SELECT cast(n1 as bigint) AS n_a, cast(n2 as bigint) AS n_b,
       |    cast(r1x2 - n1 * (n1 + 1) as bigint) AS u_a_x2,
       |    cast(tcube as bigint) AS tie_cube,
       |    round((cast(r1x2 - n1 * (n1 + 1) as double) -
       |        cast(n1 * n2 as double)) /
       |      (2.0 * sqrt(cast(n1 * n2 as double) / 12.0 *
       |        (cast(n1 + n2 + 1 as double) -
       |         cast(tcube as double) /
       |           cast((n1 + n2) * (n1 + n2 - 1) as double)))), 6) AS z_stat
       |  FROM ag)""".stripMargin

  /** One-way ANOVA F across the groups of `groupCol`, on integer
    * `xInt`. Per-group between-variance contributions Σᵢ Sᵢ²/nᵢ are
    * quantized to integer micro-units per group (one round of an
    * IEEE-determined double each) and SUMMED AS INTEGERS, so the
    * cross-group total is partition-order-free — the q_chi2 cell
    * discipline. One row: (k, n, eta_sq, f_stat). Published
    * statistics are the two O(1)-magnitude ratios only: raw sums of
    * squares reach ~10¹⁸ (cents² × rows), where a double's ulp
    * exceeds the 6-dp rounding grid and the engines' round()
    * implementations legitimately disagree by an ulp — the bounded
    * η² = SSB/SST effect size carries the same information
    * deterministically.
    */
  def anovaF(df: DataFrame, groupCol: Column, xInt: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val g = df
      .select(groupCol.as("g"), xInt.cast(dec).as("x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).cast(dec).as("n"), sum(col("x")).as("s"))
      // Sᵢ²/nᵢ in micro-units: (double(Sᵢ)·double(Sᵢ)/double(nᵢ))·1e6,
      // one round per group — the only non-exact per-group step
      .select(col("n"), col("s"),
        round(col("s").cast(DoubleType) * col("s").cast(DoubleType) /
          col("n").cast(DoubleType) * lit(1000000.0)).cast(dec).as("gb"))
    val q = df.select(xInt.cast(dec).as("x"))
      .agg(sum(col("x") * col("x")).as("q"))
    val t = g.agg(count(lit(1)).cast(dec).as("k"), sum(col("n")).as("nn"),
        sum(col("s")).as("ss"), sum(col("gb")).as("gbsum"))
      .crossJoin(broadcast(q))
    def d(c: Column): Column = c.cast(DoubleType)
    val grand = d(col("ss")) * d(col("ss")) / d(col("nn"))
    val ssb = d(col("gbsum")) / lit(1000000.0) - grand
    // ssw algebraically = SST − SSB = Σx² − ΣSᵢ²/nᵢ; compute it from
    // THAT dag (not sst − ssb) so the oracle's identical expression
    // text reproduces the same IEEE bits — two algebraically equal
    // double dags may differ in the last bit
    val ssw = d(col("q")) - d(col("gbsum")) / lit(1000000.0)
    val sst = d(col("q")) - grand
    t.select(col("k").cast(LongType).as("k"),
      col("nn").cast(LongType).as("n"),
      round(ssb / sst, 6).as("eta_sq"),
      round((ssb / (d(col("k")) - 1.0)) /
        (ssw / (d(col("nn")) - d(col("k")))), 6).as("f_stat"))
  }

  /** Kruskal–Wallis H across the groups of `groupCol` on integer
    * `xInt` — the k-group rank sibling of [[mannWhitney]] (its exact
    * 2-group specialization) and the distribution-free counterpart of
    * [[anovaF]]. Tie-corrected:
    * H = [12/(N(N+1)) · Σᵢ Rᵢ²/nᵢ − 3(N+1)] / (1 − Σ(t³−t)/(N³−N)),
    * published with ε² = (H − k + 1)/(N − k) — both O(1)-magnitude
    * (the q_anova double-ulp discipline: no raw rank sums published).
    *
    * Scale shape: ranks aggregate BY VALUE before the one cumulative
    * window (bounded by the quantized metric domain, never row
    * count); average ranks ride DOUBLED so every per-(group, value)
    * term is an exact integer; per-group Rᵢ²/(4nᵢ) takes ONE double
    * round into integer micro-units and the cross-group total is an
    * integer sum — partition-order-free, the anovaF gb discipline.
    * One row: (k, n, tie_cube, h_stat, eps_sq).
    */
  def kruskalWallis(df: DataFrame, groupCol: Column,
      xInt: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val byGV = df
      .select(groupCol.as("g"), xInt.cast(LongType).as("x"))
      .groupBy(col("g"), col("x"))
      .agg(count(lit(1)).cast(dec).as("cg"))
    val byV = byGV.groupBy(col("x")).agg(sum(col("cg")).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("x").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranked = byV.withColumn("below",
      coalesce(sum(col("c")).over(w), lit(0).cast(dec)))
    val perG = byGV.join(ranked, Seq("x"))
      .groupBy(col("g"))
      .agg(sum(col("cg")).as("n"),
        sum(col("cg") * (lit(2).cast(dec) * col("below") + col("c") +
          lit(1).cast(dec))).as("rx2"))
      // Rᵢ²/(4nᵢ) in micro-units: one double round per group, summed
      // as integers below so the total is partition-order-free
      .select(col("n"),
        round(col("rx2").cast(DoubleType) * col("rx2").cast(DoubleType) /
          (lit(4.0) * col("n").cast(DoubleType)) * lit(1000000.0))
          .cast(dec).as("rb"))
    val ties = ranked.agg(
      sum(col("c") * col("c") * col("c") - col("c")).as("tcube"))
    val t = perG.agg(count(lit(1)).cast(dec).as("k"), sum(col("n")).as("nn"),
        sum(col("rb")).as("rbsum"))
      .crossJoin(broadcast(ties))
    def d(c: Column): Column = c.cast(DoubleType)
    val nn = d(col("nn"))
    val hRaw = lit(12.0) / (nn * (nn + lit(1.0))) *
      (d(col("rbsum")) / lit(1000000.0)) - lit(3.0) * (nn + lit(1.0))
    val h = hRaw / (lit(1.0) -
      d(col("tcube")) / (nn * nn * nn - nn))
    t.select(col("k").cast(LongType).as("k"),
      col("nn").cast(LongType).as("n"),
      col("tcube").cast(LongType).as("tie_cube"),
      // + 0.0 after the round: a tiny negative ratio rounds to IEEE
      // −0.0, which one engine prints as "-0.0" and the other as
      // "0.0" — adding positive zero canonicalizes both to +0.0
      (round(h, 6) + lit(0.0)).as("h_stat"),
      (round((h - d(col("k")) + lit(1.0)) / (nn - d(col("k"))), 6) +
        lit(0.0)).as("eps_sq"))
  }

  /** Brown–Forsythe robust variance-homogeneity F across the groups
    * of `groupCol` on integer `xInt` — Levene's test with MEDIAN
    * centers (Brown & Forsythe 1974), the standard pre-test for
    * q_anova's equal-variance reading and the robust one under
    * asymmetry. W = one-way ANOVA F on zᵢⱼ = |xᵢⱼ − median(group i)|.
    *
    * Everything is exact integers until one double round per group:
    * the per-group median comes from the value-domain cumulative
    * table as a DOUBLED order statistic (m2 = x(⌈n/2⌉) + x(⌊n/2⌋+1),
    * integer even for even n), deviations ride doubled
    * (|2x − m2| · count), and the per-group Sᵢ²/nᵢ contribution is
    * micro-quantized then summed as an integer — [[anovaF]]'s
    * order-free-total discipline on the deviation metric. One row:
    * (k, n, bf_stat, eta_sq) with the q_anova O(1)-magnitude rule
    * (F and effect size only, no raw sums).
    */
  def brownForsythe(df: DataFrame, groupCol: Column,
      xInt: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val byGV = df
      .select(groupCol.as("g"), xInt.cast(LongType).as("x"))
      .groupBy(col("g"), col("x"))
      .agg(count(lit(1)).cast(dec).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("x").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cum = byGV.withColumn("below",
      coalesce(sum(col("c")).over(w), lit(0).cast(dec)))
    // n_g and the two middle order-statistic positions (1-indexed):
    // k1 = ⌈n/2⌉ = (n+1)/2 floor-div, k2 = n/2 + 1 floor-div ... both
    // integer decimal arithmetic; x(k) is the value whose cumulative
    // range [below+1, below+c] covers k
    val withN = cum.withColumn("ng",
      sum(col("c")).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("g"))))
    val two = lit(2).cast(dec)
    // The two middle order statistics x(⌈n/2⌉) and x(⌊n/2⌋+1) in
    // coverage form — exact integer comparisons only, both parities:
    // x(k) = first value whose cumulative count reaches k, and for
    // integer cum the thresholds collapse to
    //   x_lo: first value with 2·(below+c) ≥ n    (cum ≥ ⌈n/2⌉)
    //   x_hi: first value with 2·(below+c) ≥ n+1  (cum ≥ ⌊n/2⌋+1)
    // (odd n: both ⇔ cum ≥ (n+1)/2, same value — m2 = 2·median)
    val med = withN.groupBy(col("g"))
      .agg(max(col("ng")).as("n"),
        min(when(two * (col("below") + col("c")) >= col("ng"), col("x")))
          .as("xlo"),
        min(when(two * (col("below") + col("c")) >=
          col("ng") + lit(1).cast(dec), col("x"))).as("xhi"))
      .select(col("g"), col("n"),
        (col("xlo").cast(dec) + col("xhi").cast(dec)).as("m2"))
    // deviations doubled: z2 = |2x − m2| per (g, x), weight c — all
    // exact integers; the F on z is scale-invariant so the doubling
    // cancels out of the statistic
    val dev = byGV.join(med, Seq("g"))
      .select(col("g"), col("n"), col("c"),
        abs(two * col("x").cast(dec) - col("m2")).as("z2"))
    val perG = dev.groupBy(col("g"))
      .agg(max(col("n")).as("n"),
        sum(col("c") * col("z2")).as("s"),
        sum(col("c") * col("z2") * col("z2")).as("q"))
      .select(col("n"), col("s"), col("q"),
        round(col("s").cast(DoubleType) * col("s").cast(DoubleType) /
          col("n").cast(DoubleType) * lit(1000000.0)).cast(dec).as("gb"))
    val t = perG.agg(count(lit(1)).cast(dec).as("k"), sum(col("n")).as("nn"),
      sum(col("s")).as("ss"), sum(col("q")).as("qq"), sum(col("gb")).as("gbsum"))
    def d(c: Column): Column = c.cast(DoubleType)
    val grand = d(col("ss")) * d(col("ss")) / d(col("nn"))
    val ssb = d(col("gbsum")) / lit(1000000.0) - grand
    val ssw = d(col("qq")) - d(col("gbsum")) / lit(1000000.0)
    val sst = d(col("qq")) - grand
    t.select(col("k").cast(LongType).as("k"),
      col("nn").cast(LongType).as("n"),
      (round((ssb / (d(col("k")) - 1.0)) /
        (ssw / (d(col("nn")) - d(col("k")))), 6) + lit(0.0)).as("bf_stat"),
      (round(ssb / sst, 6) + lit(0.0)).as("eta_sq"))
  }

  /** DuckDB mirror of [[brownForsythe]] over `src(g, x BIGINT)`: CTE
    * chain ending in `bf`.
    */
  def brownForsytheOracleSql(src: String): String =
    s"""bgv AS (
       |  SELECT g, x, cast(count(*) as decimal(38,0)) AS c
       |  FROM $src GROUP BY 1, 2),
       |bcum AS (
       |  SELECT g, x, c,
       |    coalesce(sum(c) OVER (PARTITION BY g ORDER BY x ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      cast(0 as decimal(38,0))) AS below,
       |    sum(c) OVER (PARTITION BY g) AS ng
       |  FROM bgv),
       |bmed AS (
       |  SELECT g, max(ng) AS n,
       |    cast(min(CASE WHEN 2 * (below + c) >= ng THEN x END)
       |      as decimal(38,0)) +
       |    cast(min(CASE WHEN 2 * (below + c) >= ng + 1 THEN x END)
       |      as decimal(38,0)) AS m2
       |  FROM bcum GROUP BY 1),
       |bdev AS (
       |  SELECT v.g, m.n, v.c,
       |    abs(2 * cast(v.x as decimal(38,0)) - m.m2) AS z2
       |  FROM bgv v JOIN bmed m ON v.g = m.g),
       |bperg AS (
       |  SELECT g, max(n) AS n, sum(c * z2) AS s, sum(c * z2 * z2) AS q
       |  FROM bdev GROUP BY 1),
       |bgb AS (
       |  SELECT n, s, q,
       |    cast(round(cast(s as double) * cast(s as double) /
       |      cast(n as double) * 1000000.0) as decimal(38,0)) AS gb
       |  FROM bperg),
       |btot AS (
       |  SELECT cast(count(*) as decimal(38,0)) AS k, sum(n) AS nn,
       |    sum(s) AS ss, sum(q) AS qq, sum(gb) AS gbsum
       |  FROM bgb),
       |bf AS (
       |  SELECT cast(k as bigint) AS k, cast(nn as bigint) AS n,
       |    round(((cast(gbsum as double) / 1000000.0 -
       |        cast(ss as double) * cast(ss as double) /
       |          cast(nn as double)) / (cast(k as double) - 1.0)) /
       |      ((cast(qq as double) -
       |        cast(gbsum as double) / 1000000.0) /
       |       (cast(nn as double) - cast(k as double))), 6) + 0.0 AS bf_stat,
       |    round((cast(gbsum as double) / 1000000.0 -
       |        cast(ss as double) * cast(ss as double) /
       |          cast(nn as double)) /
       |      (cast(qq as double) -
       |        cast(ss as double) * cast(ss as double) /
       |          cast(nn as double)), 6) + 0.0 AS eta_sq
       |  FROM btot)""".stripMargin

  /** DuckDB mirror of [[kruskalWallis]] over `src(g, x BIGINT)`: CTE
    * chain ending in `kw`.
    */
  def kruskalWallisOracleSql(src: String): String =
    s"""kgv AS (
       |  SELECT g, x, cast(count(*) as decimal(38,0)) AS cg
       |  FROM $src GROUP BY 1, 2),
       |kv AS (SELECT x, sum(cg) AS c FROM kgv GROUP BY 1),
       |krank AS (
       |  SELECT x, c,
       |    coalesce(sum(c) OVER (ORDER BY x ASC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      cast(0 as decimal(38,0))) AS below
       |  FROM kv),
       |kperg AS (
       |  SELECT g, sum(cg) AS n,
       |    sum(cg * (2 * below + c + 1)) AS rx2
       |  FROM kgv JOIN krank USING (x) GROUP BY 1),
       |kgb AS (
       |  SELECT n,
       |    cast(round(cast(rx2 as double) * cast(rx2 as double) /
       |      (4.0 * cast(n as double)) * 1000000.0) as decimal(38,0)) AS rb
       |  FROM kperg),
       |kties AS (SELECT sum(c * c * c - c) AS tcube FROM krank),
       |ktot AS (
       |  SELECT cast(count(*) as decimal(38,0)) AS k, sum(n) AS nn,
       |    sum(rb) AS rbsum
       |  FROM kgb),
       |kw AS (
       |  SELECT cast(k as bigint) AS k, cast(nn as bigint) AS n,
       |    cast(tcube as bigint) AS tie_cube,
       |    round((12.0 / (cast(nn as double) * (cast(nn as double) + 1.0)) *
       |        (cast(rbsum as double) / 1000000.0) -
       |        3.0 * (cast(nn as double) + 1.0)) /
       |      (1.0 - cast(tcube as double) /
       |        (cast(nn as double) * cast(nn as double) *
       |         cast(nn as double) - cast(nn as double))), 6) + 0.0 AS h_stat,
       |    round(((12.0 / (cast(nn as double) * (cast(nn as double) + 1.0)) *
       |        (cast(rbsum as double) / 1000000.0) -
       |        3.0 * (cast(nn as double) + 1.0)) /
       |      (1.0 - cast(tcube as double) /
       |        (cast(nn as double) * cast(nn as double) *
       |         cast(nn as double) - cast(nn as double))) -
       |      cast(k as double) + 1.0) /
       |      (cast(nn as double) - cast(k as double)), 6) + 0.0 AS eps_sq
       |  FROM ktot CROSS JOIN kties)""".stripMargin

  /** DuckDB mirror of [[anovaF]] over `src(g, x BIGINT)`: CTE chain
    * ending in `anova`.
    */
  def anovaOracleSql(src: String): String =
    s"""gm AS (
       |  SELECT g, cast(count(*) as decimal(38,0)) AS n,
       |    cast(sum(cast(x as decimal(38,0))) as decimal(38,0)) AS s
       |  FROM $src GROUP BY 1),
       |gb AS (
       |  SELECT n, s,
       |    cast(round(cast(s as double) * cast(s as double) /
       |      cast(n as double) * 1000000.0) as decimal(38,0)) AS gb
       |  FROM gm),
       |qq AS (
       |  SELECT cast(sum(cast(x as decimal(38,0)) *
       |    cast(x as decimal(38,0))) as decimal(38,0)) AS q
       |  FROM $src),
       |tot AS (
       |  SELECT cast(count(*) as decimal(38,0)) AS k, sum(n) AS nn,
       |    sum(s) AS ss, sum(gb) AS gbsum
       |  FROM gb),
       |anova AS (
       |  SELECT cast(k as bigint) AS k, cast(nn as bigint) AS n,
       |    round((cast(gbsum as double) / 1000000.0 -
       |        cast(ss as double) * cast(ss as double) /
       |          cast(nn as double)) /
       |      (cast(q as double) -
       |        cast(ss as double) * cast(ss as double) /
       |          cast(nn as double)), 6) AS eta_sq,
       |    round(((cast(gbsum as double) / 1000000.0 -
       |        cast(ss as double) * cast(ss as double) /
       |          cast(nn as double)) / (cast(k as double) - 1.0)) /
       |      ((cast(q as double) -
       |        cast(gbsum as double) / 1000000.0) /
       |       (cast(nn as double) - cast(k as double))), 6) AS f_stat
       |  FROM tot CROSS JOIN qq)""".stripMargin
}
