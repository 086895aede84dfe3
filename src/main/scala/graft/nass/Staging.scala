package graft.nass

import graft.cleanse.Cleanse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Staging layer: typed CSV/JSON ingest with cleansing — the
  * quickstats/usda_api/usda_region tables
  * (reference: src/quickstats.sql:5-57 DDL, src/nass.mk:33-38 ingest).
  *
  * CSV ingest is column-ORDER based (PG \COPY skips the header without
  * matching names, src/nass.mk:34), so the explicit schema is applied
  * positionally. `value` stays STRING until cleansed — inferSchema
  * would destroy sentinel rows like "(D)".
  */
object Staging {

  /** quickstats_raw column names in file order (DDL
    * src/quickstats.sql:35-57; header observed in
    * src/quickstats/c_pro_idmt_2012.csv:1).
    */
  val quickstatsCols: Seq[String] = Seq(
    "program", "year", "period", "weekending", "geolevel", "state",
    "statefips", "agdistrict", "agdistrictcode", "county", "countycode",
    "zipcode", "region", "watershedcode", "watershed", "commodity",
    "dataitem", "domain", "domaincategory", "value", "cv")

  val quickstatsSchema: StructType = StructType(quickstatsCols.map {
    case "year" => StructField("year", IntegerType)
    case c => StructField(c, StringType)
  })

  /** usda_api columns in jq-projection order (src/nass.mk:89-95; DDL
    * src/quickstats.sql:5-24) — all text.
    */
  val usdaApiCols: Seq[String] = Seq(
    "year", "commodity_desc", "statisticcat_desc", "county_code",
    "source_desc", "unit_desc", "prodn_practice_desc", "freq_desc",
    "domain_desc", "util_practice_desc", "value",
    "reference_period_desc", "class_desc", "asd_code", "agg_level_desc",
    "domaincat_desc", "state_fips_code", "state_alpha", "group_desc")

  val usdaApiSchema: StructType =
    StructType(usdaApiCols.map(StructField(_, StringType)))

  /** usda_region columns (DDL src/quickstats.sql:26-32). */
  val usdaRegionCols: Seq[String] = Seq(
    "state_alpha", "state_fips_code", "county_code", "county_name",
    "asd_code", "asd_name")

  val usdaRegionSchema: StructType =
    StructType(usdaRegionCols.map(StructField(_, StringType)))

  /** S1: bulk CSV load of quickstats_raw files (quoted fields, embedded
    * commas, header skipped).
    */
  def readQuickstatsRaw(spark: SparkSession, paths: String*): DataFrame =
    spark.read
      .schema(quickstatsSchema)
      .option("header", true)
      // positional contract like PG \COPY: header is skipped, never
      // name-matched against the schema
      .option("enforceSchema", true)
      .option("quote", "\"")
      .option("escape", "\"")
      .csv(paths: _*)

  /** S2+S3: staging cleanse — trim every column (updateQuickStats,
    * src/quickstats.sql:64-89) then distinct (makeQuickStats,
    * src/quickstats.sql:91-98). NULL-free: \COPY loads empty CSV fields
    * as empty strings, and the reference's `col != ''` predicates depend
    * on that, so normalize NULL→'' on all string columns.
    */
  def stageQuickstats(raw: DataFrame): DataFrame = {
    val noNulls = raw.schema.fields.foldLeft(raw) { (df, f) =>
      if (f.dataType == StringType)
        df.withColumn(f.name, coalesce(col(f.name), lit("")))
      else df
    }
    Cleanse.trimAll(noNulls).distinct()
  }

  /** S4: JSON API ingest — raw Quick Stats response shape
    * {"data":[{field:string,…},…]} (src/nass.mk:108) flattened to the
    * 19-column projection.
    */
  def readUsdaApiJson(spark: SparkSession, paths: String*): DataFrame = {
    val dataElem = StructType(usdaApiCols.map(StructField(_, StringType)))
    val schema = StructType(Seq(StructField("data", ArrayType(dataElem))))
    spark.read.schema(schema).option("multiLine", true).json(paths: _*)
      .select(explode(col("data")).as("r"))
      .select(usdaApiCols.map(c => col(s"r.$c").as(c)): _*)
  }

  /** S5: region dim = 6-column distinct projection (src/nass.mk:136-139). */
  def regionFromApiJson(spark: SparkSession, paths: String*): DataFrame = {
    val allCols = usdaRegionCols ++ Seq("county_code", "asd_code")
    val dataElem = StructType(allCols.distinct.map(StructField(_, StringType)))
    val schema = StructType(Seq(StructField("data", ArrayType(dataElem))))
    spark.read.schema(schema).option("multiLine", true).json(paths: _*)
      .select(explode(col("data")).as("r"))
      .select(usdaRegionCols.map(c => col(s"r.$c").as(c)): _*)
      .distinct()
  }
}
