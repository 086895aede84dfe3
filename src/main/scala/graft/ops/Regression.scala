package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Grouped ordinary-least-squares fits from exact integer moments —
  * the "regression per segment" readout (price elasticity per flag,
  * trend per cohort) that BI layers bolt onto an engine.
  *
  * Numeric discipline (the q_cuped contract): inputs quantize to
  * integer units, every moment sum accumulates in DECIMAL(38,0) —
  * order-independent and overflow-checked, never a float partial —
  * and each published statistic is ONE division of exact integers,
  * cast to double and round(·,6)-ed, so a SQL oracle replays it
  * bit-for-bit. The closed forms keep even the intercept exact-
  * rational (no slope-reuse chain):
  *
  *   slope      = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *   intercept  = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
  *   r²         = (n·Σxy − Σx·Σy)² / ((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))
  *
  * r²'s numerator SQUARES a 38-digit decimal, so that one statistic
  * is computed in doubles from the already-exact first-order terms
  * (double mult/div are IEEE-deterministic cross-engine; only the
  * decimal→double cast of each exact term is shared with the other
  * two statistics).
  *
  * Scale shape: one map-side-combining hash aggregate to a 6-number
  * moment row per group — no window, no sort, no second pass; the
  * result is groups-sized. At 100 TB this is the cheapest shape a
  * full-scan statistic can have.
  */
object Regression {

  /** Per-group OLS of `yInt` on `xInt` (both integer-quantized
    * columns): (groups*, n, slope, intercept, r2). Groups with a
    * degenerate x (n·Σx² = (Σx)², i.e. constant x) are dropped — the
    * fit is undefined there, and NULL-vs-NaN surfaces differ across
    * engines.
    */
  def olsByGroup(df: DataFrame, groupCols: Seq[String], xInt: Column,
      yInt: Column): DataFrame = {
    val dec = DecimalType(38, 0)
    val m = df
      .select(groupCols.map(col) ++ Seq(
        xInt.cast(dec).as("x"), yInt.cast(dec).as("y")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val covN = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast(DoubleType)
    val varxN = (col("n") * col("sxx") - col("sx") * col("sx"))
      .cast(DoubleType)
    val varyN = (col("n") * col("syy") - col("sy") * col("sy"))
      .cast(DoubleType)
    val interN = (col("sy") * col("sxx") - col("sx") * col("sxy"))
      .cast(DoubleType)
    // constant-y groups (n·Σy² = (Σy)²) have varyN = 0 → r² = 0/0 =
    // NaN, the NULL-vs-NaN cross-engine surface the rest of the row
    // avoids; publish NULL there (slope/intercept stay finite) — the
    // exact-decimal comparison, not the double cast, decides
    m.filter(col("n") * col("sxx") =!= col("sx") * col("sx"))
      .select(groupCols.map(col) ++ Seq(
        col("n").cast(LongType).as("n"),
        round(covN / varxN, 6).as("slope"),
        round(interN / varxN, 6).as("intercept"),
        when(col("n") * col("syy") =!= col("sy") * col("sy"),
          round(covN * covN / (varxN * varyN), 6)).as("r2")): _*)
  }

  /** The DuckDB mirror of [[olsByGroup]] over a CTE/table `src` whose
    * columns are the group cols plus integer `x`, `y` — generated
    * here so the formula lives in one place.
    */
  def olsOracleSql(src: String, groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    s"""m AS (
       |  SELECT $g, cast(count(*) as decimal(38,0)) AS n,
       |    cast(sum(cast(x as decimal(38,0))) as decimal(38,0)) AS sx,
       |    cast(sum(cast(y as decimal(38,0))) as decimal(38,0)) AS sy,
       |    cast(sum(cast(x as decimal(38,0)) * cast(x as decimal(38,0)))
       |      as decimal(38,0)) AS sxx,
       |    cast(sum(cast(y as decimal(38,0)) * cast(y as decimal(38,0)))
       |      as decimal(38,0)) AS syy,
       |    cast(sum(cast(x as decimal(38,0)) * cast(y as decimal(38,0)))
       |      as decimal(38,0)) AS sxy
       |  FROM $src GROUP BY ${(1 to groupCols.size).mkString(", ")}),
       |ols AS (
       |  SELECT $g, cast(n as bigint) AS n,
       |    round(cast(n * sxy - sx * sy as double) /
       |      cast(n * sxx - sx * sx as double), 6) AS slope,
       |    round(cast(sy * sxx - sx * sxy as double) /
       |      cast(n * sxx - sx * sx as double), 6) AS intercept,
       |    CASE WHEN n * syy <> sy * sy THEN
       |      round(cast(n * sxy - sx * sy as double) *
       |        cast(n * sxy - sx * sy as double) /
       |        (cast(n * sxx - sx * sx as double) *
       |         cast(n * syy - sy * sy as double)), 6) END AS r2
       |  FROM m WHERE n * sxx <> sx * sx)""".stripMargin
  }
}
