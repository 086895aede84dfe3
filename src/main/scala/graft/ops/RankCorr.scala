package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spearman rank correlation per group — monotone-association
  * strength robust to outliers and any monotone rescaling, the
  * recommended correlation for heavy-tailed metrics (revenue,
  * latency) where Pearson chases the tail.
  *
  * Determinism: average ranks of ties are half-integers, so they are
  * carried DOUBLED (2·rank is always an exact integer); Pearson over
  * the doubled ranks equals Pearson over the ranks (scale cancels),
  * and the moment algebra is [[Regression]]'s exact-decimal form with
  * one sqrt+division finalization per group.
  *
  * Scale shape: ranks aggregate BY VALUE within each group first
  * (a (group, value) hash aggregate), then ONE window per axis over
  * that value table — partitioned by group and bounded by the
  * quantized value domain, never a row-count window; the joined-back
  * row table feeds a single moment aggregate. At 100 TB: two narrow
  * aggregates, two group-partitioned bounded windows, two broadcast-
  * joinable rank maps, one moment pass.
  */
object RankCorr {

  /** 2·average-rank map for integer column `v` within groups: one row
    * per (group, value) with the doubled mid-rank
    * 2·below + count + 1.
    */
  private def rank2(df: DataFrame, groupCols: Seq[String],
      v: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(v).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.groupBy((groupCols.map(col) :+ col(v)): _*)
      .agg(count(lit(1)).cast(dec).as("c"))
      .withColumn("below", coalesce(sum(col("c")).over(w), lit(0).cast(dec)))
      .select((groupCols.map(col) :+ col(v) :+
        (lit(2).cast(dec) * col("below") + col("c") + lit(1).cast(dec))
          .cast(LongType).as(s"__r2_$v")): _*)
  }

  /** Per-group Spearman ρ of integer columns `xInt` vs `yInt`:
    * (groups*, n, rho). Groups where either axis is constant are
    * dropped (ρ undefined — the [[Regression.olsByGroup]] degenerate-
    * group convention).
    */
  def spearmanByGroup(df: DataFrame, groupCols: Seq[String], xInt: Column,
      yInt: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val base = df.select(groupCols.map(col) ++ Seq(
      xInt.cast(LongType).as("x"), yInt.cast(LongType).as("y")): _*)
    // the rank maps are value-domain-sized by contract (callers
    // quantize continuous metrics to a bounded grid) — broadcast them
    // so the row-table join-back is map-side: without the hint Spark's
    // post-aggregate stats pick a sort-merge join that shuffles the
    // full row table twice (measured 17 s at sf1 for a 45 s-cpu job)
    val rx = broadcast(rank2(base, groupCols, "x"))
    val ry = broadcast(rank2(base, groupCols, "y"))
    val ranked = base
      .join(rx, groupCols :+ "x")
      .join(ry, groupCols :+ "y")
      .select(groupCols.map(col) ++ Seq(
        col("__r2_x").cast(dec).as("rx"),
        col("__r2_y").cast(dec).as("ry")): _*)
    val m = ranked.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"),
        sum(col("rx") * col("ry")).as("sxy"))
    val covN = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast(DoubleType)
    val varxN = (col("n") * col("sxx") - col("sx") * col("sx"))
      .cast(DoubleType)
    val varyN = (col("n") * col("syy") - col("sy") * col("sy"))
      .cast(DoubleType)
    m.filter(col("n") * col("sxx") =!= col("sx") * col("sx") &&
        col("n") * col("syy") =!= col("sy") * col("sy"))
      .select(groupCols.map(col) ++ Seq(
        col("n").cast(LongType).as("n"),
        round(covN / sqrt(varxN * varyN), 6).as("rho")): _*)
  }

  /** DuckDB mirror of [[spearmanByGroup]] over `src(g…, x, y)` —
    * CTE chain ending in `spearman`.
    */
  def spearmanOracleSql(src: String, groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    def rankCte(v: String): String =
      s"""r$v AS (
         |  SELECT $g, $v,
         |    cast(2 * coalesce(sum(c) OVER (PARTITION BY $g ORDER BY $v ASC
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |        cast(0 as decimal(38,0))) + c + 1 as bigint) AS r2_$v
         |  FROM (SELECT $g, $v, cast(count(*) as decimal(38,0)) AS c
         |        FROM $src GROUP BY ${(1 to groupCols.size + 1).mkString(", ")}))"""
        .stripMargin
    s"""${rankCte("x")},
       |${rankCte("y")},
       |rankedsp AS (
       |  SELECT ${groupCols.map(c => s"s.$c").mkString(", ")},
       |    cast(r2_x as decimal(38,0)) AS rx,
       |    cast(r2_y as decimal(38,0)) AS ry
       |  FROM $src s
       |  JOIN rx ON ${(groupCols :+ "x").map(c => s"s.$c = rx.$c").mkString(" AND ")}
       |  JOIN ry ON ${(groupCols :+ "y").map(c => s"s.$c = ry.$c").mkString(" AND ")}),
       |msp AS (
       |  SELECT $g, cast(count(*) as decimal(38,0)) AS n,
       |    sum(rx) AS sx, sum(ry) AS sy,
       |    sum(rx * rx) AS sxx, sum(ry * ry) AS syy,
       |    sum(rx * ry) AS sxy
       |  FROM rankedsp GROUP BY ${(1 to groupCols.size).mkString(", ")}),
       |spearman AS (
       |  SELECT $g, cast(n as bigint) AS n,
       |    round(cast(n * sxy - sx * sy as double) /
       |      sqrt(cast(n * sxx - sx * sx as double) *
       |           cast(n * syy - sy * sy as double)), 6) AS rho
       |  FROM msp
       |  WHERE n * sxx <> sx * sx AND n * syy <> sy * sy)""".stripMargin
  }
}
