package graft.nass

import graft.cleanse.Cleanse
import graft.ops.PivotFixed
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `swap` schema — SWAP-model extract downstream of the nass layer
  * (reference: src/swap.sql, file:line per member). Fixed county /
  * commodity universe, state price with documented imputations,
  * irrigated/non-irrigated acre-yield splits, 4 fixed-column pivots.
  */
class SwapPipeline(
    spark: SparkSession,
    nass: NassPipeline,
    usdaApi: DataFrame,
    countyAdc: Option[DataFrame] = None) {

  import spark.implicits._

  private def adc: DataFrame = countyAdc.getOrElse(nass.county_adc)

  /** counties universe: 184 FIPS literals (src/swap.sql:5-10). */
  lazy val counties: DataFrame = SwapPipeline.countyFips.toDF("location")

  /** commodity universe: 16 crops (src/swap.sql:12-20). */
  lazy val commodity: DataFrame = SwapPipeline.commodityList.toDF("commodity")

  /** commodity_price (src/swap.sql:22-39): state-level survey prices
    * from the API.
    */
  lazy val commodity_price: DataFrame =
    usdaApi.filter(
      col("statisticcat_desc") === "PRICE RECEIVED" &&
        col("domain_desc") === "TOTAL" &&
        col("prodn_practice_desc") === "ALL PRODUCTION PRACTICES" &&
        col("freq_desc") === "ANNUAL" &&
        col("agg_level_desc") === "STATE" &&
        !col("value").rlike("\\(.*\\)"))
      .select(
        col("state_fips_code").as("location"),
        col("year"),
        Cleanse.commodityOf(col("commodity_desc"), col("class_desc"),
          col("util_practice_desc")).as("commodity"),
        Cleanse.toNumber(col("value"), 18, 2).cast(DecimalType(10, 2)).as("price"),
        col("unit_desc").as("unit"))

  /** commodity_avg_price (src/swap.sql:41-47). */
  lazy val commodity_avg_price: DataFrame =
    commodity_price
      .groupBy(col("location"), col("commodity"), col("unit"))
      .agg(avg(col("price")).cast(DecimalType(10, 2)).as("price"))
      .select(col("location"), col("commodity"), col("price"), col("unit"))

  /** commodity_missing_price (src/swap.sql:49-86): unit-conversion
    * imputation rules for crops the survey never prices directly (e.g.
    * corn silage ≈ 0.2·5·grain price — conversion factors documented in
    * the reference with source URLs).
    */
  lazy val commodity_missing_price: DataFrame = {
    val ap = commodity_avg_price
    def rule(srcCommodity: String, cond: DataFrame => DataFrame,
        outCommodity: String, price: DataFrame => org.apache.spark.sql.Column,
        unit: DataFrame => org.apache.spark.sql.Column,
        loc: DataFrame => org.apache.spark.sql.Column = _ => col("location")) = {
      val base = cond(ap.filter(col("commodity") === srcCommodity))
      base.select(loc(base).as("location"), lit(outCommodity).as("commodity"),
        price(base).cast(DecimalType(10, 3)).as("price"), unit(base).as("unit"))
    }
    val rules = Seq(
      rule("CORN, GRAIN", _.filter(col("unit") === "$ / BU"),
        "CORN, SILAGE", _ => lit(0.2) * lit(5) * col("price"), _ => lit("$ / TON")),
      rule("HAY, ALFALFA", identity,
        "HAYLAGE, ALFALFA", _ => lit(0.2) * col("price"), _ => col("unit")),
      rule("HAY, (EXCL ALFALFA)", identity,
        "HAYLAGE, (EXCL ALFALFA)", _ => lit(0.2) * col("price"), _ => col("unit")),
      rule("HAY", identity,
        "HAY, TAME, (EXCL ALFALFA & SMALL GRAIN)", _ => col("price"), _ => col("unit")),
      rule("LENTILS", _.filter(col("unit") === "$ / CWT"),
        "LENTILS", _ => col("price") / 100, _ => lit("$ / LB")),
      rule("LENTILS", _.filter(col("unit") === "$ / CWT" && col("location") === "16"),
        "LENTILS", _ => col("price") / 100, _ => lit("$ / LB"), _ => lit("41")),
      rule("BEANS, DRY EDIBLE", identity,
        "BEANS, DRY EDIBLE, LIMA", _ => col("price"), _ => col("unit")),
      rule("BEANS, DRY EDIBLE", _.filter(col("unit") === "$ / CWT"),
        "BEANS, DRY EDIBLE, LIMA", _ => col("price") / 100, _ => lit("$ / LB")),
      rule("BEANS, DRY EDIBLE", _.filter(col("unit") === "$ / CWT"),
        "BEANS, DRY EDIBLE", _ => col("price") / 100, _ => lit("$ / LB")))
    rules.reduce(_ unionByName _).distinct()
  }

  /** harvest_2012 (src/swap.sql:89-96): county-level 2012 harvest for
    * the fixed commodity universe.
    */
  lazy val harvest_2012: DataFrame =
    nass.commodity_harvest
      .join(commodity, Seq("commodity"))
      .filter(col("year") === 2012 && col("location").rlike("^\\d{5}$") &&
        col("total_acres").isNotNull)
      .select(col("location"), col("commodity"),
        col("irrigated_acres"), col("total_acres"))
      .distinct()

  /** yield_avg_by_type (src/swap.sql:98-118): per-acre yields averaged
    * over years, with the CWT→LB bean-unit fix branch.
    */
  lazy val yield_avg_by_type: DataFrame = {
    val ybt = nass.yield_by_type
    val main = ybt
      .filter(col("unit").rlike("/ ACRE") &&
        (!col("commodity").rlike("^BEANS") || col("unit") =!= "CWT / ACRE"))
      .groupBy(col("commodity"), col("location"), col("unit"))
      .agg(
        avg(col("nonirrigated")).cast(DecimalType(10, 2)).as("nonirrigated"),
        avg(col("irrigated")).cast(DecimalType(10, 2)).as("irrigated"),
        avg(col("total")).cast(DecimalType(10, 2)).as("total"),
        count(lit(1)).as("count"))
    val beans = ybt
      .filter(col("unit") === "CWT / ACRE" && col("commodity").rlike("^BEANS"))
      .groupBy(col("commodity"), col("location"))
      .agg(
        (lit(100) * avg(col("nonirrigated")).cast(DecimalType(10, 2))).as("nonirrigated"),
        (lit(100) * avg(col("irrigated")).cast(DecimalType(10, 2))).as("irrigated"),
        (lit(100) * avg(col("total")).cast(DecimalType(10, 2))).as("total"),
        count(lit(1)).as("count"))
      .withColumn("unit", lit("LB / ACRE"))
      .select(col("commodity"), col("location"), col("unit"),
        col("nonirrigated"), col("irrigated"), col("total"), col("count"))
    main.unionByName(beans).distinct()
  }

  /** harvest_production_yield (src/swap.sql:121-137). */
  lazy val harvest_production_yield: DataFrame =
    nass.commodity_harvest
      .join(commodity, Seq("commodity"))
      .filter(col("location").rlike("^\\d{5}$") &&
        col("total_acres").isNotNull && col("total_production").isNotNull)
      .select(col("location"), col("commodity"), col("irrigated_acres"),
        col("total_acres"), col("total_production"), col("unit"))
      .distinct()
      .groupBy(col("location"), col("commodity"), col("unit"))
      .agg(avg(col("total_production") / col("total_acres"))
        .cast(DecimalType(10, 2)).as("production_yield"))
      .select(col("location"), col("commodity"), col("production_yield"),
        concat(col("unit"), lit(" / ACRE")).as("unit"))

  /** harvest_yield (src/swap.sql:139-169): the assembly — county→ad→
    * state yield fallback tiers + the unit-compatibility theta join to
    * prices (yield numerator unit must equal price denominator unit
    * modulo plural 'S': TONS/ACRE ⋈ $/TON).
    */
  lazy val harvest_yield: DataFrame = {
    val u = yield_avg_by_type.filter(col("unit").rlike("/ ACRE$"))
      .select(col("commodity"), col("unit")).distinct()
    val p = commodity_avg_price
      .unionByName(commodity_missing_price.select(
        col("location"), col("commodity"),
        col("price").cast(DecimalType(10, 2)).as("price"), col("unit")))
      .distinct()
    def tier(alias: String) = yield_avg_by_type.select(
      col("commodity").as(s"${alias}_commodity"), col("location").as(s"${alias}_loc"),
      col("unit").as(s"${alias}_unit"), col("nonirrigated").as(s"${alias}_non"),
      col("irrigated").as(s"${alias}_irr"), col("total").as(s"${alias}_tot"),
      col("location").as(s"${alias}_src"))
    val h = harvest_2012.join(counties, Seq("location"))
      .join(u, Seq("commodity"))
      .join(adc.select(col("fips"), col("adc").as("asd"), col("state_fips")),
        harvest_2012("location") === col("fips"))
    val yc = tier("yc"); val ya = tier("ya"); val ys = tier("ys")
    val yp = harvest_production_yield.select(
      col("location").as("yp_loc"), col("commodity").as("yp_commodity"),
      col("unit").as("yp_unit"), col("production_yield"))
    val pp = p.select(col("location").as("p_loc"), col("commodity").as("p_commodity"),
      col("price"), col("unit").as("price_unit"))
    val unitHead = element_at(Cleanse.splitLiteral(col("unit"), " / "), 1)
    val priceTail = element_at(Cleanse.splitLiteral(col("price_unit"), " / "), 2)
    h.join(yc, col("yc_loc") === col("fips") && col("commodity") === col("yc_commodity")
        && col("unit") === col("yc_unit"), "left")
      .join(ya, col("ya_loc") === col("asd") && col("commodity") === col("ya_commodity")
        && col("unit") === col("ya_unit"), "left")
      .join(ys, col("ys_loc") === col("state_fips") && col("commodity") === col("ys_commodity")
        && col("unit") === col("ys_unit"), "left")
      .join(yp, col("yp_loc") === col("fips") && col("commodity") === col("yp_commodity")
        && col("unit") === col("yp_unit"), "left")
      .join(pp, col("p_loc") === col("state_fips") && col("p_commodity") === col("commodity")
        && (unitHead === priceTail || unitHead === concat(priceTail, lit("S"))), "left")
      .select(col("location"), col("commodity"), col("irrigated_acres"),
        col("total_acres"), col("unit"),
        coalesce(col("yc_non"), col("ya_non"), col("ys_non")).as("nonirrigated"),
        coalesce(col("yc_irr"), col("ya_irr"), col("ys_irr")).as("irrigated"),
        coalesce(col("yc_tot"), col("ya_tot"), col("ys_tot")).as("total"),
        coalesce(col("yc_src"), col("ya_src"), col("ys_src")).as("yield_source"),
        col("production_yield"), col("price"), col("price_unit"))
  }

  /** swap (src/swap.sql:171-213): the model — see
    * [[SwapPipeline.solve]].
    */
  lazy val swap: DataFrame = SwapPipeline.solve(harvest_yield)
  /** The 4 crosstab exports (src/swap.sql:215-397) with the hardcoded
    * 39-commodity column list.
    */
  lazy val swap_net: DataFrame =
    PivotFixed.crosstab(swap, Seq("location"), "commodity", "acres",
      SwapPipeline.pivotCommodities)
  lazy val swap_price: DataFrame =
    PivotFixed.crosstab(swap, Seq("location"), "commodity", "price",
      SwapPipeline.pivotCommodities)
  lazy val swap_yield: DataFrame =
    PivotFixed.crosstab(swap, Seq("location"), "commodity", "yield",
      SwapPipeline.pivotCommodities)
  /** single-row pivot keyed by constant 1 (src/swap.sql:353-397). */
  lazy val swap_yield_unit: DataFrame =
    PivotFixed.crosstab(swap.withColumn("k", lit(1)),
      Seq("k"), "commodity", "unit", SwapPipeline.pivotCommodities)
      .drop("k")
}

object SwapPipeline {

  /** The swap model (src/swap.sql:171-213): solve
    * production = irrAcres·irrYield + dryAcres·dryYield given the
    * irrigated:dry yield RATIO, emitting NON-IRRIGATED / IRRIGATED /
    * unsplit rows. Factored out of the class so the golden spec can
    * replay the solver over a reconstructed harvest_yield preimage.
    *
    * @param hy harvest_yield-shaped rows: location, commodity,
    *           irrigated_acres, total_acres, unit, nonirrigated,
    *           irrigated, total, production_yield, price, price_unit
    */
  def solve(hy: DataFrame): DataFrame = {
    val withIrr = hy.filter(col("irrigated_acres").isNotNull)
    val nonIrr = withIrr.select(
      col("location"),
      concat(col("commodity"), lit(", NON-IRRIGATED")).as("commodity"),
      (col("total_acres") - col("irrigated_acres")).as("acres"),
      when(col("production_yield").isNotNull && col("nonirrigated").isNotNull &&
        col("irrigated").isNotNull && col("nonirrigated") =!= 0,
        col("production_yield") * col("total_acres") /
          (col("irrigated_acres") * (col("irrigated") / col("nonirrigated")) +
            (col("total_acres") - col("irrigated_acres"))))
        .otherwise(coalesce(col("nonirrigated"), col("total")))
        .cast(DecimalType(10, 2)).as("yield"),
      col("price"), col("unit"), col("price_unit"))
    val irr = withIrr.select(
      col("location"),
      concat(col("commodity"), lit(", IRRIGATED")).as("commodity"),
      col("irrigated_acres").as("acres"),
      when(col("production_yield").isNotNull && col("nonirrigated").isNotNull &&
        col("irrigated").isNotNull,
        col("production_yield") * col("total_acres") /
          (col("irrigated_acres") +
            (col("total_acres") - col("irrigated_acres")) *
              (col("nonirrigated") / col("irrigated"))))
        .otherwise(coalesce(col("irrigated"), col("total")))
        .cast(DecimalType(10, 2)).as("yield"),
      col("price"), col("unit"), col("price_unit"))
    val unsplit = hy.filter(col("irrigated_acres").isNull).select(
      col("location"), col("commodity"),
      col("total_acres").as("acres"),
      when(col("production_yield").isNotNull, col("production_yield"))
        .otherwise(col("total"))
        .cast(DecimalType(10, 2)).as("yield"),
      col("price"), col("unit"), col("price_unit"))
    nonIrr.unionByName(irr).unionByName(unsplit).distinct()
  }

  /** 184-county universe (src/swap.sql:8-10). */
  val countyFips: Seq[String] = Seq(
    "06001", "06003", "06005", "06007", "06009", "06011", "06013", "06015",
    "06017", "06019", "06021", "06023", "06033", "06035", "06039", "06041",
    "06043", "06045", "06047", "06049", "06051", "06055", "06057", "06061",
    "06063", "06067", "06075", "06077", "06081", "06089", "06091", "06093",
    "06095", "06097", "06099", "06101", "06103", "06105", "06109", "06113",
    "06115", "16001", "16003", "16009", "16013", "16015", "16017", "16021",
    "16023", "16025", "16027", "16031", "16035", "16037", "16039", "16045",
    "16047", "16049", "16053", "16055", "16057", "16059", "16061", "16063",
    "16067", "16069", "16073", "16075", "16079", "16083", "16085", "16087",
    "30001", "30023", "30029", "30035", "30039", "30047", "30049", "30053",
    "30061", "30063", "30073", "30077", "30081", "30089", "30099", "32001",
    "32005", "32007", "32009", "32011", "32013", "32015", "32017", "32019",
    "32021", "32023", "32027", "32029", "32031", "32033", "32510", "41001",
    "41003", "41005", "41007", "41009", "41011", "41013", "41015", "41017",
    "41019", "41021", "41023", "41025", "41027", "41029", "41031", "41033",
    "41035", "41037", "41039", "41041", "41043", "41045", "41047", "41049",
    "41051", "41053", "41055", "41057", "41059", "41061", "41063", "41065",
    "41067", "41069", "41071", "49001", "49003", "49021", "49023", "49027",
    "49045", "53000", "53001", "53003", "53005", "53007", "53009", "53011",
    "53013", "53015", "53017", "53019", "53021", "53023", "53025", "53027",
    "53029", "53031", "53033", "53035", "53037", "53039", "53041", "53043",
    "53045", "53047", "53049", "53051", "53053", "53055", "53057", "53059",
    "53061", "53063", "53065", "53067", "53069", "53071", "53073", "53075",
    "53077")

  /** 16-crop universe (src/swap.sql:15-20). */
  val commodityList: Seq[String] = Seq(
    "HAY, ALFALFA", "HAYLAGE, ALFALFA", "BARLEY",
    "BEANS, DRY EDIBLE", "BEANS, DRY EDIBLE, LIMA",
    "CORN, GRAIN", "CORN, SILAGE", "HAY, TAME, (EXCL ALFALFA & SMALL GRAIN)",
    "HAYLAGE, (EXCL ALFALFA)", "LENTILS", "OATS", "POPLAR", "POTATOES",
    "WHEAT, SPRING", "SUGARBEETS", "WHEAT, WINTER")

  /** Hardcoded 39-column crosstab list (src/swap.sql:220-259). */
  val pivotCommodities: Seq[String] = Seq(
    "BARLEY", "BARLEY, IRRIGATED", "BARLEY, NON-IRRIGATED",
    "BEANS, DRY EDIBLE", "BEANS, DRY EDIBLE, IRRIGATED",
    "BEANS, DRY EDIBLE, LIMA", "BEANS, DRY EDIBLE, LIMA, IRRIGATED",
    "BEANS, DRY EDIBLE, LIMA, NON-IRRIGATED",
    "BEANS, DRY EDIBLE, NON-IRRIGATED",
    "CORN, GRAIN", "CORN, GRAIN, IRRIGATED", "CORN, GRAIN, NON-IRRIGATED",
    "CORN, SILAGE", "CORN, SILAGE, IRRIGATED", "CORN, SILAGE, NON-IRRIGATED",
    "HAY, ALFALFA", "HAY, ALFALFA, IRRIGATED", "HAY, ALFALFA, NON-IRRIGATED",
    "HAYLAGE, ALFALFA", "HAYLAGE, ALFALFA, IRRIGATED",
    "HAYLAGE, ALFALFA, NON-IRRIGATED",
    "HAYLAGE, (EXCL ALFALFA)", "HAYLAGE, (EXCL ALFALFA), IRRIGATED",
    "HAYLAGE, (EXCL ALFALFA), NON-IRRIGATED",
    "HAY, TAME, (EXCL ALFALFA & SMALL GRAIN)",
    "HAY, TAME, (EXCL ALFALFA & SMALL GRAIN), IRRIGATED",
    "HAY, TAME, (EXCL ALFALFA & SMALL GRAIN), NON-IRRIGATED",
    "LENTILS", "LENTILS, IRRIGATED", "LENTILS, NON-IRRIGATED",
    "OATS", "OATS, IRRIGATED", "OATS, NON-IRRIGATED",
    "POTATOES", "SUGARBEETS, IRRIGATED", "SUGARBEETS, NON-IRRIGATED",
    "WHEAT, WINTER", "WHEAT, WINTER, IRRIGATED", "WHEAT, WINTER, NON-IRRIGATED")
}
