package graft.nass

import graft.SparkSpec
import java.nio.file.Files

/** S4/S5/S10 coverage: JSON API ingest shape (FIXTURES.md §2), region
  * dim extraction, schema-clone via limit(0).
  */
class StagingSpec extends SparkSpec {

  private lazy val jsonPath: String = {
    val dir = Files.createTempDirectory("graft-api").toFile
    val f = new java.io.File(dir, "pull1.json")
    // raw Quick Stats response shape: {"data":[{field:string,…},…]}
    val rows = Seq(
      """{"year":"2012","commodity_desc":"BARLEY","statisticcat_desc":"YIELD",
        |"county_code":"001","source_desc":"SURVEY","unit_desc":"BU / ACRE",
        |"prodn_practice_desc":"IRRIGATED","freq_desc":"ANNUAL",
        |"domain_desc":"TOTAL","util_practice_desc":"ALL UTILIZATION PRACTICES",
        |"value":"100","reference_period_desc":"YEAR","class_desc":"ALL CLASSES",
        |"asd_code":"10","agg_level_desc":"COUNTY","domaincat_desc":"",
        |"state_fips_code":"16","state_alpha":"ID","group_desc":"FIELD CROPS",
        |"county_name":"ADA","asd_name":"SOUTHWEST"}""".stripMargin.replaceAll("\n", ""),
      """{"year":"2012","commodity_desc":"BARLEY","statisticcat_desc":"YIELD",
        |"county_code":"003","source_desc":"SURVEY","unit_desc":"BU / ACRE",
        |"prodn_practice_desc":"IRRIGATED","freq_desc":"ANNUAL",
        |"domain_desc":"TOTAL","util_practice_desc":"ALL UTILIZATION PRACTICES",
        |"value":"1,200","reference_period_desc":"YEAR","class_desc":"ALL CLASSES",
        |"asd_code":"10","agg_level_desc":"COUNTY","domaincat_desc":"",
        |"state_fips_code":"16","state_alpha":"ID","group_desc":"FIELD CROPS",
        |"county_name":"ADAMS","asd_name":"SOUTHWEST"}""".stripMargin.replaceAll("\n", ""))
    Files.writeString(f.toPath, s"""{"data": [${rows.mkString(",")}]}""")
    f.getPath
  }

  test("S4: JSON API ingest flattens data[] to the 19-column projection") {
    val api = Staging.readUsdaApiJson(spark, jsonPath)
    assert(api.columns.toSeq === Staging.usdaApiCols)
    val rows = api.collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[String]("value")).toSet === Set("100", "1,200"))
  }

  test("S5: region dim is a distinct 6-column projection") {
    val region = Staging.regionFromApiJson(spark, jsonPath)
    assert(region.columns.toSeq === Staging.usdaRegionCols)
    assert(region.count() === 2)
    // feeds the location crosswalk
    val pipe = new NassPipeline(spark,
      Staging.stageQuickstats(Staging.readQuickstatsRaw(spark,
        "/root/reference/src/quickstats/c_pro_idmt_2012.csv")),
      usdaRegion = Some(region))
    val locs = pipe.location.collect().map(_.getString(0)).toSet
    assert(locs === Set("16001", "16003", "16ag10", "16"))
    val adc = pipe.county_adc.collect()
    assert(adc.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("16001", "16ag10"), ("16003", "16ag10")))
  }

  test("S10: schema clone via limit(0)") {
    val raw = Staging.readQuickstatsRaw(spark,
      "/root/reference/src/quickstats/c_pro_idmt_2012.csv")
    val clone = raw.limit(0)
    assert(clone.schema === raw.schema)
    assert(clone.count() === 0)
  }
}
