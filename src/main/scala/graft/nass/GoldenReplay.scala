package graft.nass

import org.apache.spark.sql.SparkSession

/** Replays the reference's committed quickstats CSVs through the DAG
  * and dumps the derived views for golden diffing
  * (reference inputs: src/quickstats dir; goldens: repo-root CSVs).
  * Usage: runMain graft.nass.GoldenReplay <quickstatsDir> <outDir>
  */
object GoldenReplay {
  def main(args: Array[String]): Unit = {
    val Array(inDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = Staging.readQuickstatsRaw(spark,
      s"$inDir/c_pro_idmt_2012.csv", s"$inDir/production_yield.csv")
    val staged = Staging.stageQuickstats(raw)
    val pipe = new NassPipeline(spark, staged)
    Seq(
      "stats_location" -> pipe.stats_location,
      "harvest_location_irrigated" -> pipe.harvest_location_irrigated,
      "commodity_harvest" -> pipe.commodity_harvest,
      "commodity_yield" -> pipe.commodity_yield,
      "commodity_list" -> pipe.commodity_list,
      "land_rent" -> pipe.land_rent
    ).foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[replay] wrote $name")
    }
    spark.stop()
  }
}
