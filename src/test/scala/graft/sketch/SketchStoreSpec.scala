package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchStoreSpec extends SparkSpec {
  import spark.implicits._

  private def src = (0L until 600L)
    .map(i => (i, s"t${i % 3}", s"d${i % 5}", i % 97))
    .toDF("row_id", "etype", "day", "uid")

  test("served rollup ≡ in-query KMV rollup ≡ direct sketch, bit-for-bit") {
    val table = "kmv_store_spec"
    try {
      val k = 16
      SketchStore.ensure(src, Seq("etype", "day"), "uid", k, table, 2,
        fpIdCol = "row_id")
      val served = SketchStore.serveRollup(spark, table, Seq("etype"), k)
        .select($"etype", $"n_regs", $"n_est")
        .orderBy("etype").collect().toSeq
      // in-query rollup: fine sketches merged without persistence
      val inQuery = Kmv.estimateFromSketch(
        Kmv.registers(src, Seq("etype", "day"), "uid", k)
          .groupBy($"etype")
          .agg(graft.functions.KMinAgg.k_min_distinct($"h", k).as("hs")),
        Seq("etype"), k)
        .select($"etype", $"n_regs", $"n_est")
        .orderBy("etype").collect().toSeq
      // direct coarse sketch of the raw data
      val direct = Kmv.estimateDistinct(src, Seq("etype"), "uid", k)
        .select($"etype", $"n_regs", $"n_est")
        .orderBy("etype").collect().toSeq
      assert(served === inQuery, "persistence must not change the merge")
      assert(served === direct, "trim-after-merge identity through the store")
      assert(served.nonEmpty)
      graft.CacheRegistry.releaseAll()
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("ensure reuses on identical source, rebuilds on value drift") {
    val table = "kmv_store_reuse"
    try {
      assert(SketchStore.ensure(src, Seq("etype", "day"), "uid", 8, table, 2,
        "row_id"))
      assert(!SketchStore.ensure(src, Seq("etype", "day"), "uid", 8, table, 2,
        "row_id"))
      val drifted = src.withColumn("uid",
        when($"row_id" === 0L, lit(9999L)).otherwise($"uid"))
      assert(SketchStore.ensure(drifted, Seq("etype", "day"), "uid", 8,
        table, 2, "row_id"))
      // GRAIN drift (same id, same value, different day) must also
      // invalidate — the fingerprint covers the full (grain, value)
      val regrained = src.withColumn("day",
        when($"row_id" === 1L, lit("d9")).otherwise($"day"))
      assert(SketchStore.ensure(regrained, Seq("etype", "day"), "uid", 8,
        table, 2, "row_id"))
      graft.CacheRegistry.releaseAll()
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
