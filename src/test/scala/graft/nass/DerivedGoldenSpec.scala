package graft.nass

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden checks for the two terminal assemblies the round-2 review
  * flagged as unverified: commodity_county_yield (reference
  * src/nass.sql:466-533; golden 5,866 rows) and commodity_list
  * (src/nass.sql:453-464; golden 427 rows).
  *
  * Both are pure functions of the flattened commodity views, and the
  * reference commits goldens FOR those views too — so the strongest
  * check needs no input reconstruction at all: feed the reference's
  * own commodity_harvest/yield/price/county_adc CSVs into the factored
  * assemblies (NassPipeline.countyYield / commodityList) and require
  * exact reproduction of the corresponding output golden. This diffs
  * the assembly logic end-to-end with full row coverage, independent
  * of the snapshot's quickstats input gaps.
  */
class DerivedGoldenSpec extends SparkSpec {

  private val refDir = "/root/reference"

  private def golden(name: String): DataFrame =
    spark.read.option("header", true).csv(s"$refDir/$name.csv")

  private def dec(df: DataFrame, cols: Seq[String], t: DataType): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(t)))

  private def asBool(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c,
        when(col(c) === "t" || col(c) === "true", true)
          .when(col(c) === "f" || col(c) === "false", false)
          .otherwise(col(c).cast(BooleanType))))

  /** golden inputs typed like the pipeline's own frames */
  private lazy val gHarvest = dec(golden("commodity_harvest"),
    Seq("irrigated_acres", "total_acres", "total_production"), DecimalType(18, 2))
  private lazy val gYield = dec(golden("commodity_yield"),
    Seq("irrigated", "partial", "none", "unspecified"), DecimalType(8, 2))
  private lazy val gPrice = dec(golden("commodity_price"),
    Seq("price"), DecimalType(8, 2))
  private lazy val gAdc = golden("county_adc")

  private def normNum(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, round(col(c).cast(DoubleType), 2)))

  private def diff(got: DataFrame, exp: DataFrame): (Long, Long) = {
    val cols = exp.columns.toSeq
    val g = got.select(cols.map(col): _*)
    val e = exp.select(cols.map(col): _*)
    (g.exceptAll(e).count(), e.exceptAll(g).count())
  }

  test("commodity_county_yield reproduces the golden exactly (5,866 rows)") {
    val num = Seq("yield", "county_yield", "ad_yield", "st_yield",
      "st_irrigated", "st_partial", "st_none")
    val got = normNum(
      NassPipeline.countyYield(gHarvest, gYield, gAdc), num)
    val exp = normNum(golden("commodity_county_yield"), num)
    assert(exp.count() === 5866)
    val (onlyGot, onlyExp) = diff(got, exp)
    assert(onlyExp === 0, s"$onlyExp golden rows not reproduced")
    assert(onlyGot === 0, s"$onlyGot rows produced that are not in the golden")
  }

  test("commodity_list reproduces the golden exactly (427 rows)") {
    val got = NassPipeline.commodityList(gHarvest, gYield, gPrice)
    val exp = asBool(golden("commodity_list"), Seq("harvest", "yield", "price"))
    assert(exp.count() === 427)
    val (onlyGot, onlyExp) = diff(got, exp)
    assert(onlyExp === 0, s"$onlyExp golden rows not reproduced")
    assert(onlyGot === 0, s"$onlyGot rows produced that are not in the golden")
  }
}
