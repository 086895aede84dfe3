package graft

import graft.nass.{Budget, NassPipeline, Staging, SwapPipeline}
import graft.sources.CsvSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Top-level facade: the complete reference workload as one API — a
  * user of the reference runs the same pipeline by pointing this at
  * their staged inputs and an output directory
  * (reference driver: src/nass.mk `outs` target, src/nass.mk:43-60).
  *
  * Export order mirrors each reference view's ORDER BY clause.
  */
class SummaryEngine(
    spark: SparkSession,
    quickstatsCsvs: Seq[String],
    apiJsons: Seq[String] = Nil) {

  lazy val quickstats: DataFrame =
    Staging.stageQuickstats(Staging.readQuickstatsRaw(spark, quickstatsCsvs: _*))
  lazy val usdaApi: Option[DataFrame] =
    if (apiJsons.isEmpty) None
    else Some(Staging.readUsdaApiJson(spark, apiJsons: _*))
  lazy val usdaRegion: Option[DataFrame] =
    if (apiJsons.isEmpty) None
    else Some(Staging.regionFromApiJson(spark, apiJsons: _*))

  lazy val nass: NassPipeline =
    new NassPipeline(spark, quickstats, usdaApi, usdaRegion)
  lazy val swap: SwapPipeline =
    new SwapPipeline(spark, nass,
      // typed empty fallback (same as NassPipeline): a zero-COLUMN
      // emptyDataFrame would fail analysis on the first column
      // reference; a zero-ROW frame with the api schema degrades the
      // swap layer to empty output instead
      usdaApi.getOrElse(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        graft.nass.Staging.usdaApiSchema)))

  /** Register the staged input and every nass/swap relation as temp
    * views (schema-prefixed: `nass_commodity_yield`, `swap_swap_net`…)
    * so users can `spark.sql` against the DAG exactly as they queried
    * the reference's PG schemas (`nass.commodity_yield` etc.). Views
    * are lazy — registering is free; Catalyst plans on demand.
    */
  def registerViews(): Unit = {
    quickstats.createOrReplaceTempView("quickstats")
    val nassViews: Seq[(String, DataFrame)] = Seq(
      "location" -> nass.location,
      "county_adc" -> nass.county_adc,
      "land_rent" -> nass.land_rent,
      "stats_location" -> nass.stats_location,
      "harvest_total_and_sum" -> nass.harvest_total_and_sum,
      "commodity_harvest" -> nass.commodity_harvest,
      "yield_total_and_sum" -> nass.yield_total_and_sum,
      "commodity_yield" -> nass.commodity_yield,
      "commodity_price" -> nass.commodity_price,
      "commodity_list" -> nass.commodity_list,
      "commodity_county_yield" -> nass.commodity_county_yield)
    nassViews.foreach { case (n, df) => df.createOrReplaceTempView(s"nass_$n") }
    val swapViews: Seq[(String, DataFrame)] = Seq(
      "swap" -> swap.swap,
      "swap_net" -> swap.swap_net,
      "swap_price" -> swap.swap_price,
      "swap_yield" -> swap.swap_yield,
      "swap_yield_unit" -> swap.swap_yield_unit)
    swapViews.foreach { case (n, df) => df.createOrReplaceTempView(s"swap_$n") }
  }

  /** The 7 nass-layer golden exports (src/nass.mk:43-45,54-55). */
  def exportNass(outDir: String): Unit = {
    CsvSink.exportSingle(nass.land_rent, s"$outDir/land_rent",
      Seq(col("location"), col("year"), col("dataitem"), col("value")))
    CsvSink.exportSingle(nass.commodity_harvest, s"$outDir/commodity_harvest",
      Seq(col("year"), col("location"), col("commodity")))
    CsvSink.exportSingle(nass.commodity_yield, s"$outDir/commodity_yield",
      Seq(col("year"), col("location"), col("commodity"), col("unit")))
    CsvSink.exportSingle(nass.commodity_price, s"$outDir/commodity_price",
      Seq(col("year"), col("location"), col("commodity"), col("unit")))
    CsvSink.exportSingle(nass.commodity_list, s"$outDir/commodity_list",
      Seq(col("commodity")))
    CsvSink.exportSingle(nass.county_adc, s"$outDir/county_adc",
      Seq(col("fips")))
    CsvSink.exportSingle(nass.commodity_county_yield,
      s"$outDir/commodity_county_yield", Seq(col("commodity")))
  }

  /** The 5 swap-layer exports (src/nass.mk:48-49,57-60). */
  def exportSwap(outDir: String): Unit = {
    CsvSink.exportSingle(swap.swap, s"$outDir/swap",
      Seq(col("location"), col("commodity")))
    CsvSink.exportSingle(swap.swap_net, s"$outDir/swap_net", Seq(col("location")))
    CsvSink.exportSingle(swap.swap_price, s"$outDir/swap_price", Seq(col("location")))
    CsvSink.exportSingle(swap.swap_yield, s"$outDir/swap_yield", Seq(col("location")))
    CsvSink.exportSingle(swap.swap_yield_unit, s"$outDir/swap_yield_unit")
  }

  /** The R-path output (src/budget.r → combined_harvest.csv). */
  def exportBudget(apiCsv: DataFrame, outDir: String): Unit =
    CsvSink.exportSingle(Budget.harvestArea(apiCsv), s"$outDir/combined_harvest",
      Seq(col("year"), col("crops"), col("location")))
}
