package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Robust trend statistics over PRE-AGGREGATED series — Mann–Kendall
  * trend test, the Theil–Sen median slope, and lagged
  * autocorrelation. The corpus-scale discipline: the raw table first
  * collapses to one point per (group, time bucket) — a bounded series
  * (days, hours) regardless of row count — and the O(n²)-per-series
  * pairwise statistics run on THAT, so "quadratic" means 30·29/2
  * pairs per group, not 10¹⁰. At 100 TB: one full-scan aggregate,
  * then joins between tables whose size is groups × buckets.
  *
  * Determinism: series values are exact integers; pair diffs / signs
  * are integer; the only doubles are each statistic's single
  * finalization dag (IEEE div/mult/sqrt on exact inputs), round(·,6).
  * Theil–Sen slopes quantize to ppm (round of one IEEE division per
  * pair) and the median is the lower-middle order statistic of those
  * integers — the [[OrderStats.medianCi]] convention.
  */
object TrendRobust {

  /** Mann–Kendall trend test per group over series (g…, t, y) — t an
    * integer time index, y an exact integer, one row per (g, t).
    * Output per group: (n, s_stat, var_s, z_stat) with the
    * tie-corrected variance
    * Var(S) = (n(n−1)(2n+5) − Σ tᵢ(tᵢ−1)(2tᵢ+5)) / 18
    * and the standard continuity-corrected z.
    */
  def mannKendall(series: DataFrame, groupCols: Seq[String]): DataFrame = {
    val dec = DecimalType(38, 0)
    val a = series.alias("a")
    val b = series.alias("b")
    val gEq = groupCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _)
    val s = a.join(b, gEq && col("a.t") < col("b.t"))
      .groupBy(groupCols.map(c => col(s"a.$c").as(c)): _*)
      .agg(sum(signum(col("b.y") - col("a.y")).cast(dec)).as("s"))
    val ties = series
      .groupBy((groupCols.map(col) :+ col("y")): _*)
      .agg(count(lit(1)).cast(dec).as("tc"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("tc") * (col("tc") - lit(1).cast(dec)) *
        (lit(2).cast(dec) * col("tc") + lit(5).cast(dec))).as("tsum"),
        sum(col("tc")).cast(dec).as("n"))
    def d(c: Column): Column = c.cast(DoubleType)
    val varNum = col("n") * (col("n") - lit(1).cast(dec)) *
      (lit(2).cast(dec) * col("n") + lit(5).cast(dec)) - col("tsum")
    val varS = d(varNum) / lit(18.0)
    val z = when(col("s") > 0, (d(col("s")) - 1.0) / sqrt(varS))
      .when(col("s") < 0, (d(col("s")) + 1.0) / sqrt(varS))
      .otherwise(lit(0.0))
    s.join(ties, groupCols)
      .select(groupCols.map(col) ++ Seq(
        col("n").cast(LongType).as("n"),
        col("s").cast(LongType).as("s_stat"),
        round(varS, 6).as("var_s"),
        round(z, 6).as("z_stat")): _*)
  }

  /** DuckDB mirror of [[mannKendall]] over `series(g…, t, y)` — CTE
    * chain ending in `mk`.
    */
  def mannKendallOracleSql(series: String, groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    val gEq = groupCols.map(c => s"a.$c = b.$c").mkString(" AND ")
    val gA = groupCols.map(c => s"a.$c AS $c").mkString(", ")
    s"""smk AS (
       |  SELECT $gA,
       |    cast(sum(sign(b.y - a.y)) as decimal(38,0)) AS s
       |  FROM $series a JOIN $series b ON $gEq AND a.t < b.t
       |  GROUP BY ${(1 to groupCols.size).mkString(", ")}),
       |tmk AS (
       |  SELECT $g,
       |    sum(tc * (tc - 1) * (2 * tc + 5)) AS tsum,
       |    cast(sum(tc) as decimal(38,0)) AS n
       |  FROM (SELECT $g, y, cast(count(*) as decimal(38,0)) AS tc
       |        FROM $series GROUP BY ${(1 to groupCols.size + 1).mkString(", ")})
       |  GROUP BY ${(1 to groupCols.size).mkString(", ")}),
       |mk AS (
       |  SELECT $g, cast(n as bigint) AS n, cast(s as bigint) AS s_stat,
       |    round(cast(n * (n - 1) * (2 * n + 5) - tsum as double) / 18.0, 6)
       |      AS var_s,
       |    round(CASE
       |      WHEN s > 0 THEN (cast(s as double) - 1.0) /
       |        sqrt(cast(n * (n - 1) * (2 * n + 5) - tsum as double) / 18.0)
       |      WHEN s < 0 THEN (cast(s as double) + 1.0) /
       |        sqrt(cast(n * (n - 1) * (2 * n + 5) - tsum as double) / 18.0)
       |      ELSE 0.0 END, 6) AS z_stat
       |  FROM smk JOIN tmk USING ($g))""".stripMargin
  }

  /** Theil–Sen median slope per group over series (g…, t, y): the
    * median of all pairwise slopes (yⱼ−yᵢ)/(tⱼ−tᵢ), each quantized to
    * ppm. Output: (g…, n_pairs, slope_ppm, slope) — slope_ppm the
    * exact integer statistic, slope its double readout.
    */
  def theilSen(series: DataFrame, groupCols: Seq[String]): DataFrame = {
    val a = series.alias("a")
    val b = series.alias("b")
    val gEq = groupCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _)
    val slopes = a.join(b, gEq && col("a.t") < col("b.t"))
      .select(groupCols.map(c => col(s"a.$c").as(c)) ++ Seq(
        round((col("b.y") - col("a.y")).cast(DoubleType) /
          (col("b.t") - col("a.t")).cast(DoubleType) * lit(1000000.0))
          .cast(LongType).as("sl"),
        col("a.t").as("t1"), col("b.t").as("t2")): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("sl").asc, col("t1").asc, col("t2").asc)
    slopes
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)))
      .filter(col("__rk") === expr("(__n + 1) div 2"))
      .select(groupCols.map(col) ++ Seq(
        col("__n").cast(LongType).as("n_pairs"),
        col("sl").as("slope_ppm"),
        round(col("sl").cast(DoubleType) / 1000000.0, 6).as("slope")): _*)
  }

  /** DuckDB mirror of [[theilSen]] over `series(g…, t, y)` — CTE
    * chain ending in `tsen`.
    */
  def theilSenOracleSql(series: String, groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    val gEq = groupCols.map(c => s"a.$c = b.$c").mkString(" AND ")
    val gA = groupCols.map(c => s"a.$c AS $c").mkString(", ")
    s"""slopes AS (
       |  SELECT $gA,
       |    cast(round(cast(b.y - a.y as double) /
       |      cast(b.t - a.t as double) * 1000000.0) as bigint) AS sl,
       |    a.t AS t1, b.t AS t2
       |  FROM $series a JOIN $series b ON $gEq AND a.t < b.t),
       |rksl AS (
       |  SELECT $g, sl,
       |    row_number() OVER (PARTITION BY $g
       |      ORDER BY sl ASC, t1 ASC, t2 ASC) AS rk,
       |    count(*) OVER (PARTITION BY $g) AS n
       |  FROM slopes),
       |tsen AS (
       |  SELECT $g, cast(n as bigint) AS n_pairs, sl AS slope_ppm,
       |    round(cast(sl as double) / 1000000.0, 6) AS slope
       |  FROM rksl WHERE rk = (n + 1) // 2)""".stripMargin
  }

  /** Lagged autocorrelation per group over series (g…, t, y) for lags
    * 1..`maxLag`: the Pearson correlation of (y_t, y_{t+lag}) over
    * the lag-aligned pairs (the "acf of the aligned sample" —
    * statsmodels' `adjusted=False` textbook variant computes around
    * the global mean; aligned-pair Pearson is the join-friendly form
    * and equally standard for diagnostics). Output:
    * (g…, lag, n, r).
    */
  def acf(series: DataFrame, groupCols: Seq[String],
      maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 32, "bounded lags only")
    val dec = DecimalType(38, 0)
    val lags = series.sparkSession.range(1, maxLag + 1)
      .select(col("id").cast(IntegerType).as("lag"))
    val a = series.alias("a")
    val b = series.alias("b")
    val gEq = groupCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _)
    val pairs = a.crossJoin(broadcast(lags))
      .join(b, gEq && col("b.t") === col("a.t") + col("lag"))
      .select(groupCols.map(c => col(s"a.$c").as(c)) ++ Seq(
        col("lag"),
        col("a.y").cast(dec).as("x"), col("b.y").cast(dec).as("z")): _*)
    val m = pairs.groupBy((groupCols.map(col) :+ col("lag")): _*)
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x")).as("sx"), sum(col("z")).as("sz"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("z") * col("z")).as("szz"),
        sum(col("x") * col("z")).as("sxz"))
    val covN = (col("n") * col("sxz") - col("sx") * col("sz"))
      .cast(DoubleType)
    val varxN = (col("n") * col("sxx") - col("sx") * col("sx"))
      .cast(DoubleType)
    val varzN = (col("n") * col("szz") - col("sz") * col("sz"))
      .cast(DoubleType)
    m.filter(col("n") * col("sxx") =!= col("sx") * col("sx") &&
        col("n") * col("szz") =!= col("sz") * col("sz"))
      .select(groupCols.map(col) ++ Seq(col("lag"),
        col("n").cast(LongType).as("n"),
        round(covN / sqrt(varxN * varzN), 6).as("r")): _*)
  }

  /** DuckDB mirror of [[acf]] over `series(g…, t, y)` — CTE chain
    * ending in `acf`.
    */
  def acfOracleSql(series: String, groupCols: Seq[String],
      maxLag: Int): String = {
    val g = groupCols.mkString(", ")
    val gEq = groupCols.map(c => s"a.$c = b.$c").mkString(" AND ")
    val gA = groupCols.map(c => s"a.$c AS $c").mkString(", ")
    s"""lagpairs AS (
       |  SELECT $gA, cast(l.lag as integer) AS lag,
       |    cast(a.y as decimal(38,0)) AS x,
       |    cast(b.y as decimal(38,0)) AS z
       |  FROM $series a
       |  CROSS JOIN (SELECT unnest(range(1, ${maxLag + 1})) AS lag) l
       |  JOIN $series b ON $gEq AND b.t = a.t + l.lag),
       |macf AS (
       |  SELECT $g, lag, cast(count(*) as decimal(38,0)) AS n,
       |    sum(x) AS sx, sum(z) AS sz,
       |    sum(x * x) AS sxx, sum(z * z) AS szz, sum(x * z) AS sxz
       |  FROM lagpairs GROUP BY ${(1 to groupCols.size + 1).mkString(", ")}),
       |acf AS (
       |  SELECT $g, lag, cast(n as bigint) AS n,
       |    round(cast(n * sxz - sx * sz as double) /
       |      sqrt(cast(n * sxx - sx * sx as double) *
       |           cast(n * szz - sz * sz as double)), 6) AS r
       |  FROM macf
       |  WHERE n * sxx <> sx * sx AND n * szz <> sz * sz)""".stripMargin
  }
}
