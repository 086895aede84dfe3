package graft.nass

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** API-branch golden roundtrip (the BudgetGoldenSpec technique applied
  * to `explicit_yield → yield_by_type`, reference src/nass.sql:54-106):
  * the snapshot ships no API JSON pulls, so the fixture is
  * RECONSTRUCTED from the reference's own jq projection
  * (src/nass.mk:89-95) and the view semantics, one row per semantic
  * branch — commodity suffix CASEs, all three location CASE arms,
  * sentinel/filter exclusions, comma-grouped to_number, the three
  * practice buckets with PG's half-up avg::decimal(10,2), and the
  * full-outer NULL patterns — and the pipeline must reproduce the
  * hand-derived image EXACTLY. Closes the round-5 gap: S4/S5 and the
  * usda_api branch verified end-to-end, not spec-only.
  */
class ApiGoldenSpec extends SparkSpec {

  /** One usda_api JSON record in raw Quick Stats response shape, with
    * per-field overrides on a valid YIELD/COUNTY default.
    */
  private def rec(over: (String, String)*): String = {
    val base = Map(
      "year" -> "2012", "commodity_desc" -> "HAY",
      "statisticcat_desc" -> "YIELD", "county_code" -> "107",
      "source_desc" -> "SURVEY", "unit_desc" -> "BU / ACRE",
      "prodn_practice_desc" -> "ALL PRODUCTION PRACTICES",
      "freq_desc" -> "ANNUAL", "domain_desc" -> "TOTAL",
      "util_practice_desc" -> "ALL UTILIZATION PRACTICES",
      "value" -> "100", "reference_period_desc" -> "YEAR",
      "class_desc" -> "ALL CLASSES", "asd_code" -> "40",
      "agg_level_desc" -> "COUNTY", "domaincat_desc" -> "",
      "state_fips_code" -> "06", "state_alpha" -> "CA",
      "group_desc" -> "FIELD CROPS") ++ over.toMap
    base.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")
  }

  private lazy val jsonPath: String = {
    val rows = Seq(
      // A: one (year,commodity,location,unit) key exercising ALL THREE
      // buckets + the n-bucket avg rounding (10.01, 10.02 → 10.015 →
      // half-up 10.02, PG ::decimal(10,2), src/nass.sql:80)
      rec("prodn_practice_desc" -> "NON-IRRIGATED", "value" -> "10.01"),
      rec("prodn_practice_desc" -> "NON-IRRIGATED, FOLLOWING SUMMER FALLOW",
        "value" -> "10.02"),
      // comma-grouped value through to_number (src/nass.sql:67)
      rec("prodn_practice_desc" -> "IRRIGATED", "value" -> "1,234.56"),
      rec("prodn_practice_desc" -> "ALL PRODUCTION PRACTICES", "value" -> "500"),
      // a practice in NO bucket list must not contribute anywhere
      rec("prodn_practice_desc" -> "IRRIGATED, PART OF CROP", "value" -> "999"),
      // B: class suffix + AG DISTRICT location arm (06ag40), i-only key
      rec("commodity_desc" -> "BEANS, DRY EDIBLE", "class_desc" -> "LIMA",
        "agg_level_desc" -> "AGRICULTURAL DISTRICT", "year" -> "2007",
        "unit_desc" -> "TONS / ACRE",
        "prodn_practice_desc" -> "IRRIGATED", "value" -> "3.5"),
      // C: util-practice suffix + STATE location arm, t-only key
      rec("commodity_desc" -> "CORN", "util_practice_desc" -> "GRAIN",
        "agg_level_desc" -> "STATE",
        "prodn_practice_desc" -> "IN THE OPEN", "value" -> "120"),
      // D: BOTH suffixes + a different county, n-only key
      rec("commodity_desc" -> "WHEAT", "class_desc" -> "WINTER",
        "util_practice_desc" -> "GRAIN", "county_code" -> "013",
        "prodn_practice_desc" -> "IN THE OPEN, NON-IRRIGATED",
        "value" -> "45"),
      // EXCLUDED rows — each fails exactly one WHERE predicate
      // (src/nass.sql:69-76): sentinel value, wrong statistic, agg
      // level outside the three, wrong domain/freq/reference period
      rec("prodn_practice_desc" -> "IRRIGATED", "value" -> "(D)"),
      rec("statisticcat_desc" -> "AREA HARVESTED"),
      rec("agg_level_desc" -> "NATIONAL"),
      rec("domain_desc" -> "IRRIGATION STATUS"),
      rec("freq_desc" -> "MONTHLY"),
      rec("reference_period_desc" -> "JAN"))
    val f = new java.io.File(
      Files.createTempDirectory("graft-api-golden").toFile, "pull.json")
    Files.writeString(f.toPath, s"""{"data": [${rows.mkString(",")}]}""")
    f.getPath
  }

  private lazy val pipe: NassPipeline = {
    val emptyQs = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      Staging.quickstatsSchema)
    new NassPipeline(spark, emptyQs,
      usdaApi = Some(Staging.readUsdaApiJson(spark, jsonPath)))
  }

  test("explicit_yield keeps exactly the 8 qualifying rows with conformed columns") {
    val ey = pipe.explicit_yield.collect()
    assert(ey.length === 8)
    val byLoc = ey.groupBy(_.getAs[String]("location")).view.mapValues(_.length).toMap
    assert(byLoc === Map("06107" -> 5, "06ag40" -> 1, "06" -> 1, "06013" -> 1))
    // to_number parsed the comma-grouped value
    assert(ey.exists(r => r.getAs[java.math.BigDecimal]("value") != null &&
      r.getAs[java.math.BigDecimal]("value").doubleValue == 1234.56))
  }

  test("yield_by_type reproduces the hand-derived golden image exactly") {
    val got = pipe.yield_by_type
      .select(col("year"), col("commodity"), col("location"), col("unit"),
        col("nonirrigated").cast(StringType),
        col("irrigated").cast(StringType),
        col("total").cast(StringType))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        Option(r.getString(4)), Option(r.getString(5)), Option(r.getString(6))))
      .toSet
    val expected = Set(
      // A: all three buckets; n avg 10.015 rounds HALF-UP to 10.02;
      // the bucket-less 999 row contributes nowhere
      (2012, "HAY", "06107", "BU / ACRE",
        Some("10.02"), Some("1234.56"), Some("500.00")),
      // B: ', LIMA' class suffix, ag-district location, i-only
      (2007, "BEANS, DRY EDIBLE, LIMA", "06ag40", "TONS / ACRE",
        None, Some("3.50"), None),
      // C: ', GRAIN' util suffix, state location, t-only
      (2012, "CORN, GRAIN", "06", "BU / ACRE",
        None, None, Some("120.00")),
      // D: both suffixes, n-only
      (2012, "WHEAT, WINTER, GRAIN", "06013", "BU / ACRE",
        Some("45.00"), None, None))
    assert(got === expected)
  }
}
