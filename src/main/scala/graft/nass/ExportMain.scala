package graft.nass

import graft.SummaryEngine
import org.apache.spark.sql.SparkSession

/** CLI entry mirroring `make -f nass.mk outs` (reference:
  * src/nass.mk:43-60): stage the quickstats CSVs in <inDir>, run the
  * DAG, export the nass-layer CSVs to <outDir>.
  * Usage: runMain graft.nass.ExportMain <inDir> <outDir> [apiJsonDir]
  */
object ExportMain {
  def main(args: Array[String]): Unit = {
    val inDir = args(0)
    val outDir = args(1)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val csvs = new java.io.File(inDir).listFiles()
      .filter(_.getName.endsWith(".csv")).map(_.getPath).toSeq
    val apiJsons = args.drop(2).headOption.toSeq.flatMap { d =>
      Option(new java.io.File(d).listFiles()).toSeq.flatten
        .filter(_.getName.endsWith(".json")).map(_.getPath)
    }
    val engine = new SummaryEngine(spark, csvs, apiJsons)
    engine.exportNass(outDir)
    if (apiJsons.nonEmpty) engine.exportSwap(outDir)
    println(s"[export] wrote nass outputs to $outDir")
    spark.stop()
  }
}
