package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Concentration / inequality readouts over grouped value
  * distributions — the "is this corpus dominated by a few heavy
  * domains?" audit (Gini here; HHI lives in the experiments family).
  *
  * The Gini coefficient uses the rank formulation
  *
  *   G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx),   x sorted ascending, i = 1..n
  *
  * which needs ONE within-group sort (a partitioned window — never a
  * global sort) and exact integer arithmetic end-to-end: values are
  * integer-quantized, ranks are row_number over a TOTAL order (value,
  * tiebreaker), and both the weighted sum Σ i·xᵢ and the closed-form
  * numerator/denominator accumulate in DECIMAL(38,0). The single
  * floating-point step is the final division, round(·,6)-ed — the
  * house oracle-replay contract.
  *
  * Ties: with a total order the rank weighting of equal values is
  * arbitrary but the SUM Σ i·xᵢ over a run of equal x is invariant
  * under their permutation, so G is tie-stable even though individual
  * ranks are not.
  *
  * Scale shape: one hash shuffle on the group key, one per-group sort
  * (window), one aggregate. Groups are assumed plural (per-nation,
  * per-domain) — the window is partitioned, so no single-partition
  * funnel; for a single global group, pre-aggregate by value first.
  */
object Inequality {

  /** Per-group Gini over a non-negative integer-quantized value:
    * (groups*, n, total, gini). Groups with Σx = 0 are dropped
    * (undefined). `tieCol` must make (value, tieCol) a total order
    * within every group.
    */
  def gini(df: DataFrame, groupCols: Seq[String], valueInt: Column,
      tieCol: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val ranked = df
      .select(groupCols.map(col) ++ Seq(
        valueInt.cast(dec).as("x"), tieCol.as("__tie")): _*)
      .withColumn("i", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(groupCols.map(col): _*)
          .orderBy(col("x").asc, col("__tie").asc)).cast(dec))
    ranked.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x")).as("sx"),
        sum(col("i") * col("x")).as("six"))
      .filter(col("sx") > 0)
      .select(groupCols.map(col) ++ Seq(
        col("n").cast(LongType).as("n"),
        col("sx").cast(LongType).as("total"),
        round((lit(2).cast(dec) * col("six") -
            (col("n") + lit(1).cast(dec)) * col("sx")).cast(DoubleType) /
          (col("n") * col("sx")).cast(DoubleType), 6).as("gini")): _*)
  }

  /** DuckDB mirror of [[gini]] over a CTE/table `src` with the group
    * cols plus integer `x` and tiebreaker `tie`.
    */
  def giniOracleSql(src: String, groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    s"""ranked AS (
       |  SELECT $g, cast(x as decimal(38,0)) AS x,
       |    cast(row_number() OVER (PARTITION BY $g ORDER BY x ASC, tie ASC)
       |      as decimal(38,0)) AS i
       |  FROM $src),
       |gini AS (
       |  SELECT $g, cast(count(*) as bigint) AS n,
       |    cast(sum(x) as bigint) AS total,
       |    round(cast(2 * sum(i * x) -
       |        (count(*) + 1) * sum(x) as double) /
       |      cast(count(*) * sum(x) as double), 6) AS gini
       |  FROM ranked GROUP BY ${(1 to groupCols.size).mkString(", ")}
       |  HAVING sum(x) > 0)""".stripMargin
  }
}
