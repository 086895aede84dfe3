package graft.nass

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden replay: stage the reference's committed quickstats CSVs,
  * run the DAG, diff against the reference's committed output CSVs
  * (reference: repo-root goldens; SURVEY §5).
  *
  * Coverage limits of the snapshot (the reference DB held more data
  * than the committed inputs):
  *  - c_pro_idmt_2012.csv = full 2012 CENSUS pull for Idaho/Montana;
  *  - production_yield.csv = complete PRODUCTION+YIELD extract (all
  *    states/years that reach commodity_yield) but TOTAL-domain rows
  *    only for some commodities;
  *  - no SURVEY rows at all → price/land_rent chains are untestable
  *    against goldens (covered by unit tests instead).
  */
class NassGoldenSpec extends SparkSpec {

  private val refDir = "/root/reference"

  private lazy val pipe: NassPipeline = {
    val raw = Staging.readQuickstatsRaw(spark,
      s"$refDir/src/quickstats/c_pro_idmt_2012.csv",
      s"$refDir/src/quickstats/production_yield.csv")
    new NassPipeline(spark, Staging.stageQuickstats(raw))
  }

  private def golden(name: String): DataFrame =
    spark.read.option("header", true).csv(s"$refDir/$name.csv")

  /** symmetric anti-join diff on normalized frames; empty ⇒ equal */
  private def diffCount(got: DataFrame, exp: DataFrame): (Long, Long) = {
    val cols = exp.columns.toSeq
    val g = got.select(cols.map(col): _*)
    val e = exp.select(cols.map(col): _*)
    (g.exceptAll(e).count(), e.exceptAll(g).count())
  }

  private def norm2(df: DataFrame, numCols: Seq[String], boolCols: Seq[String]): DataFrame = {
    val d1 = numCols.foldLeft(df)((d, c) =>
      d.withColumn(c, round(col(c).cast(DoubleType), 2)))
    val d2 = boolCols.foldLeft(d1)((d, c) =>
      d.withColumn(c,
        when(col(c) === "t" || col(c) === "true", true)
          .when(col(c) === "f" || col(c) === "false", false)
          .otherwise(col(c).cast(BooleanType))))
    d2.withColumn("year", col("year").cast(IntegerType))
  }

  test("commodity_yield matches the golden CSV exactly (all 244 rows)") {
    val num = Seq("irrigated", "partial", "none", "unspecified")
    val got = norm2(pipe.commodity_yield, num, Nil)
    val exp = norm2(golden("commodity_yield"), num, Nil)
    val (onlyGot, onlyExp) = diffCount(got, exp)
    assert(onlyGot === 0, "rows produced that are not in the golden")
    assert(onlyExp === 0, "golden rows not reproduced")
    assert(got.count() === 244)
  }

  test("commodity_harvest matches the golden subset for 2012 Idaho/Montana") {
    val num = Seq("irrigated_acres", "total_acres", "total_production")
    // golden scoped to head-commodities with TOTAL-domain input coverage
    val heads = pipe.stats_location
      .filter(col("year") === 2012 && substring(col("location"), 1, 2).isin("16", "30"))
      .select(col("commodity")).distinct()
    def sub(df: DataFrame) = df
      .filter(col("year") === 2012 && substring(col("location"), 1, 2).isin("16", "30"))
      .join(heads,
        split(df("commodity"), ", ").getItem(0) === heads("commodity"), "left_semi")
    val got = sub(norm2(pipe.commodity_harvest, num, Seq("reported")))
    val exp = sub(norm2(golden("commodity_harvest"), num, Seq("reported")))
    val (onlyGot, onlyExp) = diffCount(got, exp)
    assert(onlyGot === 0, "rows produced that are not in the golden")
    assert(onlyExp === 0, "golden rows not reproduced")
    assert(got.count() > 4000)
  }
}
