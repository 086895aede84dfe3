package graft.nass

import graft.cleanse.Cleanse
import graft.ops.{HierarchyRollup, Reconcile}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `nass` schema DAG re-expressed as lazy DataFrame transforms —
  * one `lazy val` per reference view, same names
  * (reference: src/nass.sql — file:line on each member).
  *
  * Materialization mirrors the reference's 4 materialized views
  * (src/nass.sql:108,236,273,360): those nodes are materialized via
  * localCheckpoint, which also TRUNCATES LINEAGE — the swap layer
  * references these subtrees many times, and without truncation the
  * accumulated logical plan grows multiplicatively until merely
  * stringifying it (Spark does so on every action for the execution
  * event) exhausts the heap. On a real cluster prefer reliable
  * checkpoint(dir) for executor-loss tolerance; all
  * other views stay lazy so Catalyst can fuse/push down across them.
  *
  * PG-compat note: run with spark.sql.ansi.enabled=false so
  * out-of-range array subscripts yield NULL like PG (e.g. `di[2]` of a
  * dash-less dataitem) — the constructor enforces it. SESSION SIDE
  * EFFECT (deliberate): the flag is set on the caller's session and
  * stays set, because the pipeline's lazy views execute actions long
  * after construction and ANSI mode is read at execution time; a
  * construct-time set-and-restore would re-enable ANSI underneath the
  * deferred plans. Callers embedding this pipeline in an ANSI session
  * must run it in a separate SparkSession (cloneSession()) instead.
  */
class NassPipeline(
    spark: SparkSession,
    quickstats: DataFrame,
    usdaApi: Option[DataFrame] = None,
    usdaRegion: Option[DataFrame] = None) {

  spark.conf.set("spark.sql.ansi.enabled", "false")

  private val M = DecimalType(18, 2) // staged measure type

  private def notSentinel(c: Column) = !c.rlike("^\\(.*\\)")
  private def api: DataFrame = usdaApi.getOrElse(
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      Staging.usdaApiSchema))
  private def region: DataFrame = usdaRegion.getOrElse(
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      Staging.usdaRegionSchema))

  // ------------------------------------------------------------ dims
  /** location crosswalk: county ∪ ag-district ∪ state ids
    * (src/nass.sql:7-24).
    */
  lazy val location: DataFrame = {
    val r = region
    val county = r.filter(col("county_code") =!= "")
      .select(concat(col("state_fips_code"), col("county_code")).as("location"),
        concat(col("county_name"), lit(", "), col("state_alpha")).as("name"))
    val asd = r.filter(col("asd_code") =!= "")
      .select(concat(col("state_fips_code"), lit("ag"), col("asd_code")).as("location"),
        concat(col("asd_name"), lit(", "), col("state_alpha")).as("name"))
    val state = r.select(col("state_fips_code").as("location"),
      col("state_alpha").as("name"))
    county.union(asd).union(state).distinct()
  }

  /** county↔ag-district crosswalk, superset schema per SURVEY §5: the
    * committed county_adc.csv carries (fips,adc,state,agdistrict,county)
    * while src/nass.sql:27-34 declares (fips,asd,state_fips); consumers
    * reference `adc` (src/nass.sql:470,491) — emit both spellings.
    */
  lazy val county_adc: DataFrame =
    region.filter(col("county_code") =!= "")
      .select(
        concat(col("state_fips_code"), col("county_code")).as("fips"),
        concat(col("state_fips_code"), lit("ag"), col("asd_code")).as("adc"),
        col("state_fips_code").as("state_fips"),
        col("state_alpha").as("state"),
        col("asd_name").as("agdistrict"),
        col("county_name").as("county"))
      .distinct()

  // ------------------------------------------------------- land rent
  /** land_rent (src/nass.sql:37-51): SURVEY cash-rent rows with regex
    * boolean flags. Note ' IRRIGATED' (leading space) intentionally
    * does NOT match 'NON-IRRIGATED'.
    */
  lazy val land_rent: DataFrame =
    quickstats.filter(col("dataitem").rlike("RENT, CASH,.*"))
      .select(
        Cleanse.locationOf(col("statefips"), col("agdistrictcode"), col("countycode"))
          .as("location"),
        col("year"),
        col("dataitem").rlike(" IRRIGATED").as("irrigated"),
        col("dataitem").rlike("NON-IRRIGATED").as("non_irrigated"),
        col("dataitem").rlike("PASTURE").as("pasture"),
        Cleanse.toNumber(col("value"), 18, 2).as("value"),
        col("dataitem"))

  // ------------------------------------------------- usda_api branch
  /** explicit_yield (src/nass.sql:54-76): SURVEY-API yield rows with
    * commodity normalization + location derivation.
    */
  lazy val explicit_yield: DataFrame =
    api.filter(
      col("statisticcat_desc") === "YIELD" &&
        col("agg_level_desc").isin("AGRICULTURAL DISTRICT", "COUNTY", "STATE") &&
        col("domain_desc") === "TOTAL" &&
        col("freq_desc") === "ANNUAL" &&
        col("reference_period_desc") === "YEAR" &&
        notSentinel(col("value")))
      .select(
        col("year").cast(IntegerType).as("year"),
        Cleanse.commodityOf(col("commodity_desc"), col("class_desc"),
          col("util_practice_desc")).as("commodity"),
        when(col("agg_level_desc") === "AGRICULTURAL DISTRICT",
          concat(col("state_fips_code"), lit("ag"), col("asd_code")))
          .when(col("agg_level_desc") === "COUNTY",
            concat(col("state_fips_code"), col("county_code")))
          .when(col("agg_level_desc") === "STATE", col("state_fips_code"))
          .otherwise(lit("none")).as("location"),
        col("prodn_practice_desc"),
        Cleanse.toNumber(col("value"), 18, 2).as("value"),
        col("unit_desc").as("unit"))

  /** yield_by_type (src/nass.sql:78-106): 3 practice buckets averaged
    * then reconciled via full-outer USING chain.
    */
  lazy val yield_by_type: DataFrame = {
    def bucket(practices: Seq[String], as: String) =
      explicit_yield.filter(col("prodn_practice_desc").isin(practices: _*))
        .groupBy(col("year"), col("commodity"), col("location"), col("unit"))
        .agg(avg(col("value")).cast(DecimalType(10, 2)).as(as))
    val n = bucket(Seq("IN THE OPEN, NON-IRRIGATED", "IRRIGATED, NONE OF CROP",
      "NON-IRRIGATED", "NON-IRRIGATED, CONTINUOUS CROP",
      "NON-IRRIGATED, FOLLOWING SUMMER FALLOW"), "nonirrigated")
    val i = bucket(Seq("IN THE OPEN, IRRIGATED", "IRRIGATED",
      "IRRIGATED, ENTIRE CROP"), "irrigated")
    val t = bucket(Seq("ALL PRODUCTION PRACTICES", "IN THE OPEN"), "total")
    val keys = Seq("year", "commodity", "location", "unit")
    n.join(i, keys, "full_outer").join(t, keys, "full_outer")
      .select(col("year"), col("commodity"), col("location"), col("unit"),
        col("nonirrigated"), col("irrigated"), col("total"))
  }

  // --------------------------------------------------- CENSUS parse hub
  /** stats_location (src/nass.sql:108-128, MATERIALIZED): the central
    * CENSUS parse — location conformance, numeric cleanse, dataitem →
    * (commodity path, measurement) arrays.
    */
  lazy val stats_location: DataFrame = {
    val a = quickstats
      .filter(col("period") === "YEAR" && col("domain") === "TOTAL" &&
        col("program") === "CENSUS" && notSentinel(col("value")))
      .withColumn("location",
        Cleanse.locationOf(col("statefips"), col("agdistrictcode"), col("countycode")))
      .withColumn("value_number", Cleanse.toNumber(col("value"), 18, 2))
      .withColumn("di", Cleanse.splitLiteral(col("dataitem"), " - "))
    a.select(
      col("commodity"), col("location"), col("year"),
      col("value_number").as("value"),
      Cleanse.splitLiteral(element_at(col("di"), 1), ", ").as("commodity_a"),
      Cleanse.splitLiteral(element_at(col("di"), 2), ", ").as("item_a"),
      element_at(col("di"), 2).as("item"),
      col("dataitem"))
      .distinct()
      .localCheckpoint()
  }

  // ------------------------------------------------------ harvest chain
  /** acres_location (src/nass.sql:131-137). */
  lazy val acres_location: DataFrame =
    stats_location
      .filter(element_at(col("item_a"), 1)
        .isin("ACRES HARVESTED", "ACRES BEARING", "ACRES IN PRODUCTION"))
      .select(col("commodity"), col("location"), col("year"),
        col("value").as("acres"),
        array_remove(col("commodity_a"), col("commodity")).as("subcommodity"),
        col("item_a"))

  /** production_location (src/nass.sql:139-145). */
  lazy val production_location: DataFrame =
    stats_location
      .filter(element_at(col("item_a"), 1) === "PRODUCTION")
      .select(col("commodity"), col("location"), col("year"),
        col("value").as("production"),
        regexp_replace(element_at(col("item_a"), 2), "MEASURED IN ", "").as("unit"),
        array_remove(col("commodity_a"), col("commodity")).as("subcommodity"),
        slice(col("item_a"), 3, 8).as("subproduction"))

  /** harvest_location (src/nass.sql:147-155): max-deduped acres ⋈
    * production.
    */
  lazy val harvest_location: DataFrame = {
    val h = acres_location
      .groupBy(col("commodity"), col("location"), col("year"), col("subcommodity"))
      .agg(max(col("acres")).as("acres"))
    production_location
      .select(col("commodity"), col("location"), col("year"), col("subcommodity"),
        col("production"), col("unit"))
      .join(h, Seq("commodity", "location", "year", "subcommodity"), "full_outer")
      .select(col("commodity"), col("location"), col("year"), col("subcommodity"),
        col("acres"), col("production"), col("unit"))
  }

  /** subcommodity_explicitly_irrigated (src/nass.sql:158-162). */
  lazy val subcommodity_explicitly_irrigated: DataFrame =
    harvest_location.filter(array_contains(col("subcommodity"), "IRRIGATED"))
      .select(col("commodity"),
        array_remove(col("subcommodity"), "IRRIGATED").as("subcommodity"))
      .distinct()

  /** harvest_location_irrigated (src/nass.sql:171-195): irrigated ⋈
    * non-irrigated split with explicit-irrigation flag.
    */
  lazy val harvest_location_irrigated: DataFrame = {
    val i = harvest_location
      .filter(array_contains(col("subcommodity"), "IRRIGATED"))
      .select(col("commodity"), col("location"), col("year"),
        array_remove(col("subcommodity"), "IRRIGATED").as("subcommodity"),
        col("acres").as("i_acres"), col("production").as("i_production"),
        col("unit").as("i_unit"))
    val n = harvest_location
      .filter(!array_contains(col("subcommodity"), "IRRIGATED"))
      .select(col("commodity"), col("location"), col("year"), col("subcommodity"),
        col("acres").as("n_acres"), col("production").as("n_production"),
        col("unit").as("n_unit"))
    val s = subcommodity_explicitly_irrigated.withColumn("s_matched", lit(true))
    n.join(i, Seq("commodity", "location", "year", "subcommodity"), "full_outer")
      .join(s, Seq("commodity", "subcommodity"), "left")
      .select(
        col("commodity"), col("location"), col("year"), col("subcommodity"),
        coalesce(col("s_matched"), lit(false)).as("explicitly_irrigated"),
        col("i_acres").as("irrigated_acres"),
        coalesce(col("n_acres"), col("i_acres")).as("total_acres"),
        col("n_production").as("total_production"),
        col("n_unit").as("unit"))
  }

  /** harvest_by_leaves (src/nass.sql:198-230): SUM rollup; window
    * partition excludes unit (it rides along as a carry column).
    */
  lazy val harvest_by_leaves: DataFrame = {
    val base = harvest_location_irrigated.select(
      col("commodity"), col("location"), col("year"), col("subcommodity"),
      col("irrigated_acres"), col("total_acres"), col("total_production"),
      col("unit"))
    val leafRows = HierarchyRollup.leaves(
      base, Seq("commodity", "location", "year"), "subcommodity")
    HierarchyRollup.rollup(leafRows,
      groupKeys = Seq("commodity", "location", "year"),
      pathCol = "subcommodity",
      measures = Seq("irrigated_acres", "total_acres", "total_production"),
      mode = HierarchyRollup.SumMode,
      carry = Seq("unit"))
  }

  /** harvest_total_and_sum (src/nass.sql:236-249, MATERIALIZED):
    * reported vs rolled-up, reconciled by greatest.
    */
  lazy val harvest_total_and_sum: DataFrame =
    Reconcile.reconcile(
      harvest_location_irrigated, harvest_by_leaves,
      keys = Seq("commodity", "location", "year", "subcommodity", "unit"),
      measures = Seq("irrigated_acres", "total_acres", "total_production"),
      policy = Reconcile.Greatest)
      .localCheckpoint()

  /** commodity_harvest (src/nass.sql:251-257). */
  lazy val commodity_harvest: DataFrame =
    harvest_total_and_sum.select(
      array_join(concat(array(col("commodity")), col("subcommodity")), ", ")
        .as("commodity"),
      col("location"), col("year"), col("reported"),
      col("irrigated_acres"), col("total_acres"), col("total_production"),
      col("unit"))

  // -------------------------------------------------------- yield chain
  /** yield_location (src/nass.sql:264-271). */
  lazy val yield_location: DataFrame =
    stats_location.filter(element_at(col("item_a"), 1) === "YIELD")
      .select(col("commodity"), col("location"), col("year"),
        col("value").as("yield"),
        regexp_replace(element_at(col("item_a"), 2), "MEASURED IN ", "").as("unit"),
        array_remove(col("commodity_a"), col("commodity")).as("subcommodity"),
        slice(col("item_a"), 3, 8).as("subyield"))

  /** yield_location_irrigated (src/nass.sql:274-318, MATERIALIZED):
    * 4-way full-outer variant matrix i/p/n/u.
    */
  lazy val yield_location_irrigated: DataFrame = {
    def variant(tag: String, both: Seq[String]) =
      yield_location
        .filter(both.map(t => array_contains(col("subcommodity"), t)).reduce(_ && _))
        .select(col("commodity"), col("location"), col("year"),
          both.foldLeft(col("subcommodity"))((c, t) => array_remove(c, t))
            .as("subcommodity"),
          col("unit"), col("yield").as(tag))
    val i = variant("irrigated", Seq("IRRIGATED", "ENTIRE CROP"))
    val p = variant("partial", Seq("IRRIGATED", "PART OF CROP"))
    val n = variant("none", Seq("IRRIGATED", "NONE OF CROP"))
    val u = yield_location
      .filter(!array_contains(col("subcommodity"), "IRRIGATED"))
      .select(col("commodity"), col("location"), col("year"),
        col("subcommodity"), col("unit"), col("yield").as("unspecified"))
    val keys = Seq("commodity", "location", "year", "subcommodity", "unit")
    i.join(p, keys, "full_outer").join(n, keys, "full_outer")
      .join(u, keys, "full_outer")
      .select(col("commodity"), col("location"), col("year"),
        col("subcommodity"), col("unit"),
        col("irrigated"), col("partial"), col("none"), col("unspecified"))
      .localCheckpoint()
  }

  /** yield_by_leaves (src/nass.sql:322-357): AVG rollup; unit IS in the
    * window partition (a group key), final cast decimal(8,2).
    */
  lazy val yield_by_leaves: DataFrame = {
    val leafRows = HierarchyRollup.leaves(
      yield_location_irrigated,
      Seq("commodity", "location", "year", "unit"), "subcommodity")
    HierarchyRollup.rollup(leafRows,
      groupKeys = Seq("commodity", "location", "year", "unit"),
      pathCol = "subcommodity",
      measures = Seq("irrigated", "partial", "none", "unspecified"),
      mode = HierarchyRollup.AvgMode)
      .select(col("commodity"), col("location"), col("year"), col("subcommodity"),
        col("unit"),
        col("irrigated").cast(DecimalType(8, 2)).as("irrigated"),
        col("partial").cast(DecimalType(8, 2)).as("partial"),
        col("none").cast(DecimalType(8, 2)).as("none"),
        col("unspecified").cast(DecimalType(8, 2)).as("unspecified"))
  }

  /** yield_total_and_sum (src/nass.sql:360-376, MATERIALIZED):
    * reported-first coalesce.
    */
  lazy val yield_total_and_sum: DataFrame =
    Reconcile.reconcile(
      yield_location_irrigated, yield_by_leaves,
      keys = Seq("commodity", "location", "year", "subcommodity", "unit"),
      measures = Seq("irrigated", "none", "partial", "unspecified"),
      policy = Reconcile.ReportedFirst)
      .localCheckpoint()

  /** commodity_yield (src/nass.sql:378-383). */
  lazy val commodity_yield: DataFrame =
    yield_total_and_sum.select(
      array_join(concat(array(col("commodity")), col("subcommodity")), ", ")
        .as("commodity"),
      col("location"), col("year"), col("unit"),
      col("irrigated"), col("partial"), col("none"), col("unspecified"))

  // -------------------------------------------------------- price chain
  /** price_location (src/nass.sql:387-406): SURVEY price rows; the
    * commodity prefix is stripped from the path with a data-driven
    * regex (anchored here; PG replaces the first match, which for NASS
    * dataitems is always the prefix).
    */
  lazy val price_location: DataFrame = {
    val a = quickstats
      .filter(col("domain") === "TOTAL" && col("program") === "SURVEY" &&
        col("period") === "YEAR" &&
        col("dataitem").rlike(" - PRICE RECEIVED") &&
        notSentinel(col("value")))
      .withColumn("location",
        Cleanse.locationOf(col("statefips"), col("agdistrictcode"), col("countycode")))
      .withColumn("price", Cleanse.toNumber(col("value"), 18, 2))
      .withColumn("di", Cleanse.splitLiteral(col("dataitem"), " - "))
    // PG string_to_array('',…)={} — root rows must get an EMPTY path,
    // not [""], or they never reconcile with their rollup twins
    val stripped = regexp_replace(element_at(col("di"), 1),
      concat(lit("^"), Cleanse.regexEscape(col("commodity")), lit("(, )?")),
      lit(""))
    a.select(
      col("commodity"), col("location"), col("year"), col("price"),
      when(stripped === "", array().cast(ArrayType(StringType)))
        .otherwise(split(stripped, java.util.regex.Pattern.quote(", ")))
        .as("subcommodity"),
      lit("price").as("item"),
      regexp_replace(element_at(col("di"), 2),
        "^PRICE RECEIVED, MEASURED IN ", "").as("unit"))
      .distinct()
  }

  /** price_by_leaves (src/nass.sql:409-436): AVG rollup like yield. */
  lazy val price_by_leaves: DataFrame = {
    val leafRows = HierarchyRollup.leaves(
      price_location.select(col("commodity"), col("location"), col("year"),
        col("subcommodity"), col("unit"), col("price")),
      Seq("commodity", "location", "year", "unit"), "subcommodity")
    HierarchyRollup.rollup(leafRows,
      groupKeys = Seq("commodity", "location", "year", "unit"),
      pathCol = "subcommodity",
      measures = Seq("price"),
      mode = HierarchyRollup.AvgMode)
      .select(col("commodity"), col("location"), col("year"), col("subcommodity"),
        col("unit"), col("price").cast(DecimalType(8, 2)).as("price"))
  }

  /** price_total_and_sum (src/nass.sql:438-444). */
  lazy val price_total_and_sum: DataFrame =
    Reconcile.reconcile(
      price_location.select(col("commodity"), col("location"), col("year"),
        col("subcommodity"), col("unit"), col("price")),
      price_by_leaves,
      keys = Seq("commodity", "location", "year", "subcommodity", "unit"),
      measures = Seq("price"),
      policy = Reconcile.ReportedFirst)

  /** commodity_price (src/nass.sql:446-451). */
  lazy val commodity_price: DataFrame =
    price_total_and_sum.select(
      array_join(concat(array(col("commodity")), col("subcommodity")), ", ")
        .as("commodity"),
      col("location"), col("year"), col("unit"), col("price"))

  // ------------------------------------------------------ presence list
  /** commodity_list (src/nass.sql:453-464). */
  lazy val commodity_list: DataFrame =
    NassPipeline.commodityList(commodity_harvest, commodity_yield, commodity_price)

  // ------------------------------------------------- county yield tiers
  /** commodity_county_yield (src/nass.sql:466-533). */
  def commodityCountyYield(countyAdc: DataFrame): DataFrame =
    NassPipeline.countyYield(commodity_harvest, commodity_yield, countyAdc)

  /** Default county-yield using the region-derived crosswalk. */
  lazy val commodity_county_yield: DataFrame = commodityCountyYield(county_adc)
}

/** The two terminal assemblies are pure functions of the flattened
  * commodity views, factored out so the golden specs can replay them
  * over the reference's own committed commodity_* CSVs (an exact
  * end-to-end diff, independent of snapshot input coverage).
  */
object NassPipeline {

  /** commodity_list (src/nass.sql:453-464): 3-way full-outer presence
    * matrix with PG row-var NULL-test semantics (side matched).
    */
  def commodityList(harvest: DataFrame, yld: DataFrame,
      price: DataFrame): DataFrame = {
    val h = harvest.select(col("commodity")).distinct()
      .withColumn("h", lit(true))
    val y = yld.select(col("commodity")).distinct()
      .withColumn("y", lit(true))
    val p = price.select(col("commodity")).distinct()
      .withColumn("p", lit(true))
    h.join(y, Seq("commodity"), "full_outer")
      .join(p, Seq("commodity"), "full_outer")
      .select(col("commodity"),
        coalesce(col("h"), lit(false)).as("harvest"),
        coalesce(col("y"), lit(false)).as("yield"),
        coalesce(col("p"), lit(false)).as("price"))
  }

  /** commodity_county_yield (src/nass.sql:466-533): the 6-CTE tiered
    * fallback assembly. Faithful quirk: `location~'.....'` is an
    * UNANCHORED 5-char match, so 6-char ag-district ids pass into `c`
    * and therefore into the state tier `s`.
    */
  def countyYield(harvest: DataFrame, yld: DataFrame,
      countyAdc: DataFrame): DataFrame = {
    val f = harvest
      .filter(col("location").rlike("....."))
      .join(countyAdc.select(col("fips"), col("adc")),
        harvest("location") === countyAdc("fips"))
      .select(col("commodity"), col("fips"), col("adc"),
        substring(col("fips"), 1, 2).as("state"))
      .distinct()
    val u = harvest.filter(col("unit").isNotNull)
      .select(col("commodity"), col("unit")).distinct()
    val c = harvest
      .filter(col("total_acres").isNotNull && col("total_production").isNotNull &&
        col("location").rlike("....."))
      .groupBy(col("commodity"), col("location").as("fips"), col("unit"))
      .agg(avg(col("total_production") / col("total_acres"))
        .cast(DecimalType(10, 2)).as("yield"))
    val a = c.join(countyAdc.select(col("fips"), col("adc")), Seq("fips"))
      .groupBy(col("commodity"), col("adc"), col("unit"))
      .agg(avg(col("yield")).cast(DecimalType(10, 2)).as("yield"))
    val s = c.groupBy(col("commodity"),
      substring(col("fips"), 1, 2).as("state"), col("unit"))
      .agg(avg(col("yield")).cast(DecimalType(10, 2)).as("yield"))
    val sy = yld
      .groupBy(col("commodity"),
        regexp_replace(col("unit"), " / ACRE", "").as("unit"),
        col("location").as("state"))
      .agg(
        avg(col("irrigated")).cast(DecimalType(10, 2)).as("irrigated"),
        avg(col("partial")).cast(DecimalType(10, 2)).as("partial"),
        avg(col("none")).cast(DecimalType(10, 2)).as("none"),
        avg(col("unspecified")).cast(DecimalType(10, 2)).as("unspecified"))
    val al = f.join(u, Seq("commodity"))
      .join(c.withColumnRenamed("yield", "county_yield"),
        Seq("commodity", "fips", "unit"), "left")
      .join(a.withColumnRenamed("yield", "ad_yield"),
        Seq("commodity", "adc", "unit"), "left")
      .join(s.withColumnRenamed("yield", "st_yield"),
        Seq("commodity", "state", "unit"), "left")
    al.join(sy, Seq("commodity", "state", "unit"), "full_outer")
      .select(col("commodity"), col("unit"), col("fips"), col("adc"), col("state"),
        coalesce(col("county_yield"), col("ad_yield"), col("st_yield"),
          col("partial")).as("yield"),
        col("county_yield"), col("ad_yield"), col("st_yield"),
        col("irrigated").as("st_irrigated"),
        col("partial").as("st_partial"),
        col("none").as("st_none"))
  }
}
