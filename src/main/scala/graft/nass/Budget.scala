package graft.nass

import graft.cleanse.Cleanse
import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Re-expression of the reference's in-memory R variant
  * (reference: src/budget.r) — the AREA HARVESTED download → cleanse →
  * irrigated self-split → CENSUS-over-SURVEY dedup chain that produces
  * harvest<yr>.csv / combined_harvest.csv, plus the census-vs-survey
  * comparison routine.
  *
  * Input: the Quick Stats API CSV shape (src/budget.r:24-27) with
  * columns source_desc, commodity_desc, short_desc, domain_desc,
  * domaincat_desc, agg_level_desc, state_fips_code, asd_code,
  * county_code, year, Value, reference_period_desc.
  */
object Budget {

  /** Shared cleanse: filter → crop-name extraction → numeric parse →
    * zero-padding → combined-county drop → location derivation → the
    * irrigated self-split left-merge (src/budget.r:30-78).
    */
  private def preprocess(api: DataFrame): DataFrame = {
    val filtered = api
      .filter(col("domain_desc") === "TOTAL" &&
        col("reference_period_desc") === "YEAR" &&
        col("agg_level_desc").isin("AGRICULTURAL DISTRICT", "COUNTY", "STATE"))
      // drop irrigation breakdown variants, keep total + ', IRRIGATED'
      .filter(!col("short_desc").contains(", NON-IRRIGATED") &&
        !col("short_desc").contains(", IRRIGATED, ENTIRE CROP") &&
        !col("short_desc").contains(", IRRIGATED, NONE OF CROP") &&
        !col("short_desc").contains(", PART OF CROP, IRRIGATED PORTION"))
      .withColumn("crops",
        when(col("short_desc").rlike(" - ACRES"),
          regexp_extract(col("short_desc"), "(.*) - ACRES.*", 1))
          .otherwise(col("short_desc")))
      .withColumn("total_v", Cleanse.toNumber(col("Value"), 18, 2)
        .cast(DoubleType))
      .withColumn("state_fips_code", Cleanse.padCode(col("state_fips_code"), 2))
      .withColumn("county_code", Cleanse.padCode(col("county_code"), 3))
      .withColumn("asd_code", Cleanse.padCode(col("asd_code"), 2))
      .filter(col("county_code").isNull || col("county_code") =!= "998")
      .withColumn("location",
        when(col("agg_level_desc") === "STATE", col("state_fips_code"))
          .when(col("agg_level_desc") === "COUNTY",
            concat(col("state_fips_code"), col("county_code")))
          .otherwise(concat(col("state_fips_code"), lit("ag"), col("asd_code"))))
      .select(col("source_desc"), col("year").cast(IntegerType).as("year"),
        col("crops"), col("location"), col("total_v").as("total"))
    val irrigated = filtered
      .filter(col("crops").contains(", IRRIGATED"))
      .select(col("source_desc"),
        regexp_replace(col("crops"), ", IRRIGATED", "").as("crops"),
        col("location"), col("year"),
        col("total").as("irrigated"))
    // the reference merges on (source, crops, location) only because
    // getArea processes ONE year per call (src/budget.r:10,76-78);
    // keying the merge on year too is identical for per-year batches
    // and stays correct when a caller feeds multiple years at once
    filtered
      .filter(!col("crops").contains(", IRRIGATED"))
      .join(irrigated, Seq("source_desc", "crops", "location", "year"), "left")
  }

  /** harvest<yr> output (src/budget.r:82-106): CENSUS preferred over
    * SURVEY per (crops, location, year) — the R split/first-row idiom
    * relies on merge's source_desc sort; expressed directly as a
    * ranking window.
    */
  def harvestArea(api: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("crops"), col("location"), col("year"))
      .orderBy(col("source_desc").asc)
    preprocess(api)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("source_desc"), col("year"), col("crops"), col("location"),
        col("total"), col("irrigated"))
  }

  /** census_survey_comparison output (src/budget.r:118-199): for
    * (crops, location) reported by BOTH sources, percent difference
    * relative to the CENSUS row.
    */
  def censusSurveyComparison(api: DataFrame): DataFrame = {
    def bySource(src: String, c: String) =
      first(when(col("source_desc") === src, col(c)), ignoreNulls = true)
    preprocess(api)
      .filter(col("total").isNotNull)
      .groupBy(col("crops"), col("location"))
      .agg(
        min(col("year")).as("year"),
        count(lit(1)).as("n"),
        bySource("CENSUS", "total").as("census_total"),
        bySource("SURVEY", "total").as("survey_total"),
        bySource("CENSUS", "irrigated").as("census_irrigated"),
        bySource("SURVEY", "irrigated").as("survey_irrigated"))
      .filter(col("n") > 1)
      .select(col("crops"), col("location"), col("year"),
        col("census_total").as("total"),
        col("census_irrigated").as("irrigated"),
        (abs(col("survey_total") - col("census_total")) / col("census_total"))
          .as("percent_diff"),
        (abs(col("survey_irrigated") - col("census_irrigated")) /
          col("census_irrigated")).as("percent_irrigated_diff"))
  }
}
