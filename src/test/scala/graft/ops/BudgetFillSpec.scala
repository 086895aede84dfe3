package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BudgetFillSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    // (id, grp, cost, score)
    (1L, "a", 40L, 0.9),
    (2L, "a", 50L, 0.8),
    (3L, "a", 30L, 0.7), // cum 120 > 100 → dropped
    (4L, "a", 5L, 0.6),  // after the overflow row → also dropped
    (5L, "b", 100L, 0.5), // exactly the budget → kept
    (6L, "b", 1L, 0.4),
    (7L, "c", 500L, 1.0)  // single row over budget → group empties
  ).toDF("id", "grp", "cost", "score")

  private def fill(budget: Double) =
    BudgetFill.fill(docs, Seq("grp"), "cost",
      Seq($"score".desc, $"id".asc), budget)

  test("keeps each group's best-first prefix within the budget") {
    val kept = fill(100.0).select($"id", $"cum_cost")
      .as[(Long, Long)].collect().toMap
    assert(kept == Map(1L -> 40L, 2L -> 90L, 5L -> 100L))
  }

  test("the ≤ boundary is inclusive and groups are independent") {
    val kept = fill(90.0).as[(Long, String, Long, Double, Long)]
      .collect().map(_._1).toSet
    assert(kept == Set(1L, 2L)) // cum 90 kept; b's 100-cost row now drops
  }

  test("zero budget keeps nothing; huge budget keeps everything") {
    assert(fill(0.0).count() == 0)
    assert(fill(1e9).count() == docs.count())
  }

  test("law: a smaller budget's kept set is a prefix of a larger one's") {
    val data = (1L to 60L).map(i =>
      (i, s"g${i % 3}", (i * 7 % 13) + 1, (i * 31 % 97) / 97.0))
      .toDF("id", "grp", "cost", "score")
    def kept(b: Double) = BudgetFill.fill(data, Seq("grp"), "cost",
      Seq($"score".desc, $"id".asc), b)
      .select($"id").as[Long].collect().toSet
    val budgets = Seq(0.0, 10.0, 25.0, 60.0, 200.0, 1e6)
    budgets.sliding(2).foreach { case Seq(lo, hi) =>
      assert(kept(lo).subsetOf(kept(hi)),
        s"budget $lo kept rows that budget $hi dropped")
    }
  }

  test("ordering ties are broken by the explicit tiebreak column") {
    val tied = Seq((1L, "g", 60L, 0.5), (2L, "g", 60L, 0.5))
      .toDF("id", "grp", "cost", "score")
    val kept = BudgetFill.fill(tied, Seq("grp"), "cost",
      Seq($"score".desc, $"id".asc), 60.0).as[(Long, String, Long, Double, Long)]
      .collect().map(_._1).toSeq
    assert(kept == Seq(1L)) // lower id wins the boundary slot
  }
}
