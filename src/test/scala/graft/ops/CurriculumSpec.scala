package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stride-scheduling laws: every prefix is proportionally mixed (±2
  * docs per domain), positions are a dense permutation, each domain
  * streams in its own rank order, and the schedule is
  * partitioning-invariant.
  */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  // 3 domains with sizes 60 / 30 / 10 and weights equal to size →
  // prefix shares should track 0.6 / 0.3 / 0.1
  private lazy val docs = (0 until 100).map { i =>
    val dom = if (i < 60) "big" else if (i < 90) "mid" else "small"
    (i.toLong, dom)
  }.toDF("id", "domain")
  private lazy val weights = Seq(("big", 60.0), ("mid", 30.0),
    ("small", 10.0)).toDF("domain", "weight")

  private lazy val ordered =
    Curriculum.order(docs, "id", "domain", weights, numShards = 8)
      .orderBy("position").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))

  test("positions are a dense 0..N-1 permutation") {
    assert(ordered.map(_._1).toSeq === (0L until 100L))
  }

  test("every prefix is proportionally mixed to within ±2 per domain") {
    val share = Map("big" -> 0.6, "mid" -> 0.3, "small" -> 0.1)
    for (l <- Seq(10, 25, 50, 80, 100)) {
      val prefix = ordered.take(l)
      for ((dom, s) <- share) {
        val got = prefix.count(_._3 == dom)
        assert(math.abs(got - l * s) <= 2.0,
          s"prefix $l: $dom has $got docs, expected ~${l * s}")
      }
    }
  }

  test("each domain streams in ascending domain_rank (subsequence law)") {
    ordered.groupBy(_._3).foreach { case (_, rows) =>
      val ranks = rows.sortBy(_._1).map(_._4).toSeq
      assert(ranks === ranks.sorted)
      assert(ranks === (0L until ranks.length))
    }
  }

  test("a domain missing from the weights frame fails loudly") {
    val partial = Seq(("big", 60.0), ("mid", 30.0)).toDF("domain", "weight")
    val ex = intercept[Exception] {
      Curriculum.order(docs, "id", "domain", partial, numShards = 4)
        .count()
    }
    assert(ex.getMessage.contains("no weight for domain") ||
      Option(ex.getCause).exists(_.getMessage.contains("no weight for domain")))
  }

  test("partitioning invariance") {
    val again = Curriculum.order(docs.repartition(7), "id", "domain",
      weights, numShards = 3)
      .orderBy("position").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(again.toSeq === ordered.toSeq)
  }
}
