package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Order-statistic readouts: distribution-free median confidence
  * intervals and split-conformal thresholds — the quantile-rank
  * family where the statistic IS a ranked row, so determinism is
  * free once the rank order is total.
  *
  * Scale shape: one partitioned window (rank within group — never a
  * global sort) plus a groups-sized aggregate. The CI/threshold rank
  * indices are computed from n alone: integer arithmetic for the
  * conformal rank (exact ceil via div), one shared IEEE expression
  * (sqrt/mult/floor on the same doubles) for the normal-approximation
  * median bounds — both replay identically in any engine.
  */
object OrderStats {

  /** Per-group median with a distribution-free ~95 % CI by the
    * normal-approximation order-statistic rule: ranks
    * l = max(1, floor((n − 1.96·√n)/2)), u = n + 1 − l; median = the
    * lower-middle order statistic (rank ⌈n/2⌉, exact integer). Output:
    * (groups*, n, median, ci_lo, ci_hi). (`tieCol` totalizes the
    * order; equal values make the rank choice arbitrary but the VALUE
    * at any rank within a tie-run identical.)
    */
  def medianCi(df: DataFrame, groupCols: Seq[String], valueInt: Column,
      tieCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__x").asc, col("__tie").asc)
    val ranked = df
      .select(groupCols.map(col) ++ Seq(valueInt.cast(LongType).as("__x"),
        tieCol.as("__tie")): _*)
      .withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)))
    val l = greatest(lit(1L),
      floor((col("__n").cast(DoubleType) -
        lit(1.96) * sqrt(col("__n").cast(DoubleType))) / 2.0).cast(LongType))
    val med = expr("(__n + 1) div 2").cast(LongType)
    ranked
      .withColumn("__l", l)
      .withColumn("__u", col("__n") + 1L - col("__l"))
      .withColumn("__m", med)
      .filter(col("__rk") === col("__l") || col("__rk") === col("__u") ||
        col("__rk") === col("__m"))
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__n")).cast(LongType).as("n"),
        max(when(col("__rk") === col("__m"), col("__x"))).as("median"),
        max(when(col("__rk") === col("__l"), col("__x"))).as("ci_lo"),
        max(when(col("__rk") === col("__u"), col("__x"))).as("ci_hi"))
  }

  /** DuckDB mirror of [[medianCi]] over `src(g…, x, tie)`. */
  def medianCiOracleSql(src: String, groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    s"""ranked AS (
       |  SELECT $g, x,
       |    row_number() OVER (PARTITION BY $g ORDER BY x ASC, tie ASC)
       |      AS rk,
       |    count(*) OVER (PARTITION BY $g) AS n
       |  FROM $src),
       |marked AS (
       |  SELECT *,
       |    greatest(1, cast(floor((cast(n as double) -
       |      1.96 * sqrt(cast(n as double))) / 2.0) as bigint)) AS l,
       |    cast((n + 1) // 2 as bigint) AS m
       |  FROM ranked),
       |medci AS (
       |  SELECT $g, cast(max(n) as bigint) AS n,
       |    max(CASE WHEN rk = m THEN x END) AS median,
       |    max(CASE WHEN rk = l THEN x END) AS ci_lo,
       |    max(CASE WHEN rk = n + 1 - l THEN x END) AS ci_hi
       |  FROM marked GROUP BY ${(1 to groupCols.size).mkString(", ")})"""
      .stripMargin
  }

  /** Split-conformal threshold (Vovk; Lei et al.): the k-th smallest
    * calibration nonconformity with k = ⌈(n+1)(1−α)⌉ — EXACT integer
    * rank k = (9(n+1) + 9) div 10 at α = 0.1 — plus empirical
    * coverage of that threshold on the disjoint test split. Input:
    * integer nonconformity `ncInt`, boolean `isCalib`. Output one
    * row: (n_calib, k, q_hat, n_test, covered, coverage).
    *
    * k is CLAMPED to n_calib: for tiny calibration splits (n < 9 at
    * α = 0.1) the nominal rank ⌈(n+1)(1−α)⌉ exceeds n and the
    * conformal convention is q_hat = +∞ (always covered); publishing
    * the max calibration score is the finite, engine-portable stand-in
    * (coverage still reads ≥ 1−α). An EMPTY calibration split has no
    * finite threshold at all and yields an empty frame — callers must
    * supply ≥ 1 calibration row.
    */
  def conformal(df: DataFrame, ncInt: Column, isCalib: Column,
      tieCol: Column): DataFrame = {
    val base = df.select(ncInt.cast(LongType).as("nc"),
      isCalib.as("cal"), tieCol.as("tie"))
    val calib = base.filter(col("cal"))
    val n = calib.agg(count(lit(1)).as("n_calib"))
      .withColumn("k",
        least(expr("((n_calib + 1) * 9 + 9) div 10"), col("n_calib")))
    // global rank via the range-sharded SNM rank — the calibration
    // split is corpus-sized here, so a single-reducer window is the
    // exact funnel this suite bans (the Curriculum/qRankTransform
    // discipline); snm_rank is 0-based
    val qhat = graft.dedup.SortedNeighborhood
      .rankByOrder(calib.select(col("nc"), col("tie")), Seq("nc", "tie"), 32)
      .join(broadcast(n), col("snm_rank") === col("k") - 1L)
      .select(col("n_calib"), col("k"), col("nc").as("q_hat"))
    base.filter(!col("cal")).crossJoin(broadcast(qhat))
      .groupBy(col("n_calib"), col("k"), col("q_hat"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("nc") <= col("q_hat"), 1L).otherwise(0L))
          .as("covered"))
      .select(col("n_calib"), col("k"), col("q_hat"), col("n_test"),
        col("covered"),
        round(col("covered").cast(DoubleType) /
          col("n_test").cast(DoubleType), 6).as("coverage"))
  }

  /** DuckDB mirror of [[conformal]] over `src(nc, cal, tie)`. */
  def conformalOracleSql(src: String): String =
    s"""calib AS (SELECT nc, tie FROM $src WHERE cal),
       |nk AS (
       |  SELECT count(*) AS n_calib,
       |    least(((count(*) + 1) * 9 + 9) // 10, count(*)) AS k
       |  FROM calib),
       |qhat AS (
       |  SELECT n_calib, k, nc AS q_hat FROM (
       |    SELECT nc, row_number() OVER (ORDER BY nc ASC, tie ASC) AS rk
       |    FROM calib) r JOIN nk ON r.rk = nk.k),
       |conf AS (
       |  SELECT cast(n_calib as bigint) AS n_calib, cast(k as bigint) AS k,
       |    q_hat, cast(count(*) as bigint) AS n_test,
       |    cast(sum(CASE WHEN t.nc <= q_hat THEN 1 ELSE 0 END) as bigint)
       |      AS covered,
       |    round(cast(sum(CASE WHEN t.nc <= q_hat THEN 1 ELSE 0 END)
       |        as double) / cast(count(*) as double), 6) AS coverage
       |  FROM (SELECT nc FROM $src WHERE NOT cal) t CROSS JOIN qhat
       |  GROUP BY 1, 2, 3)""".stripMargin
}
