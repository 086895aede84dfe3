package graft

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the headline queries so the
  * physical plans can be audited: filters/projections must reach the
  * parquet scan (PushedFilters / ReadSchema), small sides must
  * broadcast, and hot paths must sit inside WholeStageCodegen spans.
  * Usage: runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      // Same join-strategy configs as the bench/verify sessions so the
      // dumped plans show the join strategies the benched engine
      // actually runs (VERDICT r16: plans/r16 were captured without
      // them and could not evidence the benched execution).
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "67108864")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the FULL declared inventory, in declared order — partial lists
    // rot (round 9 found a global-window shape hiding in a query the
    // old 78-name list didn't cover)
    graft.queries.Inventory.entries.foreach { case (name, fn, _) =>
      println(s"\n========== $name ==========")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
