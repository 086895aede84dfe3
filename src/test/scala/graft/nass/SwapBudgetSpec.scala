package graft.nass

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Unit coverage for the swap layer + the R-path re-expression using
  * synthetic API fixtures (the snapshot has no SURVEY/API data — see
  * FIXTURES.md §2). Values are chosen so every imputation/solver branch
  * is exercised with hand-computable expectations.
  */
class SwapBudgetSpec extends SparkSpec {
  import spark.implicits._

  /** minimal usda_api fixture: prices for CORN,GRAIN / HAY,ALFALFA /
    * LENTILS / BEANS (drives the imputation rules), plus YIELD rows.
    */
  private def apiFixture: DataFrame = {
    def priceRow(fips: String, commodity: String, cls: String, value: String,
        unit: String, year: String) = (year, commodity, "PRICE RECEIVED", "",
      "SURVEY", unit, "ALL PRODUCTION PRACTICES", "ANNUAL", "TOTAL",
      "ALL UTILIZATION PRACTICES", value, "YEAR", cls, "", "STATE", "",
      fips, "XX", "CROPS")
    def yieldRow(fips: String, county: String, commodity: String,
        practice: String, value: String, unit: String, year: String) =
      (year, commodity, "YIELD", county, "SURVEY", unit, practice, "ANNUAL",
        "TOTAL", "ALL UTILIZATION PRACTICES", value, "YEAR", "ALL CLASSES",
        "", if (county.isEmpty) "STATE" else "COUNTY", "", fips, "XX", "CROPS")
    Seq(
      priceRow("16", "CORN", "GRAIN", "4.00", "$ / BU", "2012"),
      priceRow("16", "CORN", "GRAIN", "6.00", "$ / BU", "2013"),
      priceRow("16", "HAY", "ALFALFA", "200", "$ / TON", "2012"),
      priceRow("16", "LENTILS", "ALL CLASSES", "30.00", "$ / CWT", "2012"),
      priceRow("16", "BEANS", "DRY EDIBLE", "38.00", "$ / CWT", "2012"),
      priceRow("16", "BARLEY", "ALL CLASSES", "(D)", "$ / BU", "2012"),
      yieldRow("16", "001", "BARLEY", "ALL PRODUCTION PRACTICES", "80", "BU / ACRE", "2012"),
      yieldRow("16", "001", "BARLEY", "IRRIGATED", "100", "BU / ACRE", "2012"),
      yieldRow("16", "001", "BARLEY", "NON-IRRIGATED", "60", "BU / ACRE", "2012"),
      yieldRow("16", "", "BARLEY", "ALL PRODUCTION PRACTICES", "75", "BU / ACRE", "2012")
    ).toDF(Staging.usdaApiCols: _*)
  }

  private lazy val nassPipe: NassPipeline = {
    val raw = Staging.readQuickstatsRaw(spark,
      "/root/reference/src/quickstats/c_pro_idmt_2012.csv")
    new NassPipeline(spark, Staging.stageQuickstats(raw), Some(apiFixture))
  }

  private lazy val adcFixture =
    Seq(("16001", "16ag10", "16"), ("16003", "16ag10", "16"))
      .toDF("fips", "adc", "state_fips")

  private lazy val swapPipe =
    new SwapPipeline(spark, nassPipe, apiFixture, Some(adcFixture))

  test("commodity_avg_price averages across years, drops sentinels") {
    val p = swapPipe.commodity_avg_price.collect()
      .map(r => (r.getString(1), r.getString(0)) -> r.getDecimal(2).doubleValue).toMap
    assert(p(("CORN, GRAIN" , "16")) === 5.00)   // avg(4, 6)
    assert(!p.contains(("BARLEY", "16")))        // (D) filtered
  }

  test("missing-price imputation: corn silage = 0.2*5*grain price") {
    val mp = swapPipe.commodity_missing_price.collect()
      .map(r => (r.getString(1), r.getString(3)) -> r.getDecimal(2).doubleValue).toMap
    assert(mp(("CORN, SILAGE", "$ / TON")) === 5.00)      // 0.2*5*5.00
    assert(mp(("HAYLAGE, ALFALFA", "$ / TON")) === 40.00) // 0.2*200
    assert(mp(("LENTILS", "$ / LB")) === 0.30)            // 30/100
    assert(mp(("BEANS, DRY EDIBLE", "$ / LB")) === 0.38)
  }

  test("lentils oregon(41) rule copies the idaho(16) price") {
    val rows = swapPipe.commodity_missing_price
      .filter($"commodity" === "LENTILS").collect()
    assert(rows.map(_.getString(0)).toSet === Set("16", "41"))
  }

  test("yield_by_type buckets practices into non/irrigated/total") {
    val ybt = nassPipe.yield_by_type
      .filter($"commodity" === "BARLEY" && $"location" === "16001").collect()
    assert(ybt.length === 1)
    val r = ybt.head
    assert(r.getAs[java.math.BigDecimal]("nonirrigated").doubleValue === 60.0)
    assert(r.getAs[java.math.BigDecimal]("irrigated").doubleValue === 100.0)
    assert(r.getAs[java.math.BigDecimal]("total").doubleValue === 80.0)
  }

  test("swap solver splits acres via the irrigated:dry yield ratio") {
    val swap = swapPipe.swap.filter($"location" === "16001" &&
      $"commodity".startsWith("BARLEY")).collect()
    // harvest_2012 from real 2012 census: BARLEY 16001 has irrigated
    // acres → expect the NON-IRRIGATED / IRRIGATED split rows
    val names = swap.map(_.getString(1)).toSet
    assert(names.contains("BARLEY, IRRIGATED") || names.contains("BARLEY"))
    swap.foreach { r =>
      val y = r.getDecimal(3)
      assert(y == null || y.doubleValue > 0)
    }
  }

  test("swap pivots have the fixed 39-commodity schema") {
    val cols = swapPipe.swap_net.columns
    assert(cols.length === 40) // location + 39
    assert(cols.head === "location")
    assert(cols.contains("BEANS, DRY EDIBLE, LIMA, NON-IRRIGATED"))
    assert(swapPipe.swap_yield_unit.columns.length === 39)
  }

  // ------------------------------------------------------------ budget.r

  private def budgetFixture: DataFrame = Seq(
    // (source, commodity, short_desc, domain, domaincat, agg, state, asd, county, year, value, refper)
    ("CENSUS", "BARLEY", "BARLEY - ACRES HARVESTED", "TOTAL", "", "COUNTY", "6", "10", "1", "2012", "1,000", "YEAR"),
    ("SURVEY", "BARLEY", "BARLEY - ACRES HARVESTED", "TOTAL", "", "COUNTY", "6", "10", "1", "2012", "900", "YEAR"),
    ("CENSUS", "BARLEY", "BARLEY, IRRIGATED - ACRES HARVESTED", "TOTAL", "", "COUNTY", "6", "10", "1", "2012", "400", "YEAR"),
    ("SURVEY", "BARLEY", "BARLEY, IRRIGATED - ACRES HARVESTED", "TOTAL", "", "COUNTY", "6", "10", "1", "2012", "300", "YEAR"),
    ("CENSUS", "BARLEY", "BARLEY, NON-IRRIGATED - ACRES HARVESTED", "TOTAL", "", "COUNTY", "6", "10", "1", "2012", "600", "YEAR"),
    ("CENSUS", "BARLEY", "BARLEY - ACRES HARVESTED", "TOTAL", "", "COUNTY", "6", "10", "998", "2012", "50", "YEAR"),
    ("SURVEY", "OATS", "OATS - ACRES HARVESTED", "TOTAL", "", "STATE", "6", "", "", "2012", "123", "YEAR"),
    ("CENSUS", "WHEAT", "WHEAT - ACRES HARVESTED", "NOT TOTAL", "", "COUNTY", "6", "10", "1", "2012", "7", "YEAR")
  ).toDF("source_desc", "commodity_desc", "short_desc", "domain_desc",
    "domaincat_desc", "agg_level_desc", "state_fips_code", "asd_code",
    "county_code", "year", "Value", "reference_period_desc")

  test("budget.r path: census preferred, irrigated self-merged, 998 dropped") {
    val out = Budget.harvestArea(budgetFixture).collect()
      .map(r => (r.getString(2), r.getString(3)) -> r).toMap
    val barley = out(("BARLEY", "06001"))
    assert(barley.getString(0) === "CENSUS")          // census wins
    assert(barley.getDouble(4) === 1000.0)            // comma-parsed
    assert(barley.getDouble(5) === 400.0)             // irrigated merged
    assert(out(("OATS", "06")).getString(0) === "SURVEY") // survey-only kept
    assert(!out.keys.exists(_._2 == "06998"))         // combined dropped
    assert(!out.keys.exists(_._1 == "WHEAT"))         // non-TOTAL dropped
    assert(!out.keys.exists(_._1.contains("NON-IRRIGATED")))
  }

  test("budget.r comparison: percent diff relative to census") {
    val cmp = Budget.censusSurveyComparison(budgetFixture).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val b = cmp(("BARLEY", "06001"))
    assert(math.abs(b.getDouble(5) - 0.1) < 1e-9)       // |900-1000|/1000
    assert(math.abs(b.getDouble(6) - 0.25) < 1e-9)      // |300-400|/400
    assert(!cmp.contains(("OATS", "06")))               // single-source
  }
}
