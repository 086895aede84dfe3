package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "67108864")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // measure plan-construction + analysis + optimization + physical
    // planning time per query, twice (second = warm caches)
    val names = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
      .getOrElse(graft.queries.Inventory.entries.map(_._1))
    val rows = names.map { name =>
      val fn = graft.queries.Inventory.entries
        .collectFirst { case (`name`, f, _) => f }.get
      def once(): Double = {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // force full planning
        (System.nanoTime() - t0) / 1e9
      }
      val c = once(); val w = once()
      graft.CacheRegistry.releaseAll(); spark.catalog.clearCache()
      (name, c, w)
    }
    println("==== planning seconds (cold, warm) ====")
    rows.sortBy(-_._3).foreach { case (n, c, w) =>
      println(f"[plan] $n%-24s cold=$c%6.2f warm=$w%6.2f")
    }
    println(f"[plan] TOTAL cold=${rows.map(_._2).sum}%8.2f " +
      f"warm=${rows.map(_._3).sum}%8.2f")
    spark.stop()
  }
}
