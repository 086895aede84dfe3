package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bounded top-k aggregate must agree with the window formulation
  * it replaces — on every group, at every k — while keeping a
  * window-free, partially-aggregated plan.
  */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  // skewed fixture: group sizes 1, 2, 40, 400; values collide across
  // groups; ids unique per group
  private lazy val df = {
    val rows =
      Seq(("a", 7L, 1L)) ++
        (0 until 2).map(i => ("b", 5L + i, 10L + i)) ++
        (0 until 40).map(i => ("c", (i % 7).toLong, 100L + i)) ++
        (0 until 400).map(i => ("d", (i % 23).toLong, 1000L + i))
    rows.toDF("g", "v", "id")
  }

  private def viaAgg(k: Int) = df.groupBy($"g")
    .agg(TopKAgg.top_k_by($"v", $"id", k).as("top"))
    .select($"g", posexplode($"top").as(Seq("p", "t")))
    .select($"g", ($"p" + 1).as("rnk"), $"t.ord".as("v"), $"t.payload".as("id"))
    .as[(String, Int, Long, Long)].collect().toSet

  private def viaWindow(k: Int) = df
    .withColumn("rnk", row_number().over(
      Window.partitionBy($"g").orderBy($"v".desc, $"id".asc)))
    .filter($"rnk" <= k)
    .select($"g", $"rnk", $"v", $"id")
    .as[(String, Int, Long, Long)].collect().toSet

  test("agrees with the row_number window on every group and k") {
    for (k <- Seq(1, 3, 5, 50)) {
      assert(viaAgg(k) === viaWindow(k), s"k=$k")
    }
  }

  test("groups smaller than k emit all their rows; NULLs are skipped") {
    val withNulls = df.unionByName(
      Seq(("a", Option.empty[Long], Option(2L)),
        ("a", Option(9L), Option.empty[Long]))
        .toDF("g", "v", "id"))
    val out = withNulls.groupBy($"g")
      .agg(TopKAgg.top_k_by($"v", $"id", 5).as("top"))
      .select($"g", size($"top").as("n"))
      .as[(String, Int)].collect().toMap
    assert(out("a") === 1) // both null-bearing rows skipped
    assert(out("b") === 2)
    assert(out("c") === 5)
  }

  test("the plan partially aggregates and contains no Window node") {
    val plan = df.groupBy($"g")
      .agg(TopKAgg.top_k_by($"v", $"id", 3).as("top"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      plan)
    // partial + final pair: the aggregate runs map-side before the shuffle
    assert(plan.contains("partial_top_k_by") ||
      plan.toLowerCase.contains("partial"), plan)
  }

  test("non-bigint inputs fail analysis, not at runtime") {
    val bad = intercept[Exception] {
      df.groupBy($"g").agg(TopKAgg.top_k_by($"g", $"id", 3)).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("bigint"))
  }
}
