package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Parallelism.widen]]'s plan heuristic: the widen must reach
  * narrow plans AND broadcast-join plans (whose logical Join never
  * shuffles), while leaving genuinely width-setting plans untouched
  * without compiling or executing them.
  */
class ParallelismSpec extends SparkSpec {
  import spark.implicits._

  test("widen repartitions a narrow few-partition plan to the target") {
    val narrow = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
      .withColumn("h", md5(col("id").cast("string")))
    val w = Parallelism.widen(narrow, target = 4)
    assert(w.rdd.getNumPartitions == 4)
  }

  test("widen is the identity on an already-shuffled plan") {
    val agg = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
      .groupBy(col("id") % 10).count()
    assert(Parallelism.widen(agg, target = 4) eq agg)
  }

  test("widen still widens a broadcast-join plan (small dim side)") {
    // a logical Join whose dim side fits under the broadcast threshold
    // never shuffles — treating it as width-setting would silently
    // no-op the widen for the expression-heavy joins that need it
    val big = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
      .withColumn("k", col("id") % 5)
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (4L, "e"))
      .toDF("k", "label")
    val joined = big.join(dim, Seq("k"))
    val w = Parallelism.widen(joined, target = 4)
    assert(w.rdd.getNumPartitions == 4)
  }

  test("widen leaves a big-big join plan untouched (both sides shuffle)") {
    val a = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
      .withColumn("pad", lit("x" * 64))
    val b = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
      .withColumn("pad2", lit("y" * 64))
    val bcOff = spark.sessionState.conf.autoBroadcastJoinThreshold
    val joined = a.join(b, Seq("id"))
    // force both sides over the (temporarily tiny) broadcast threshold
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try assert(Parallelism.widen(joined, target = 4) eq joined)
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
      bcOff.toString)
  }
}
