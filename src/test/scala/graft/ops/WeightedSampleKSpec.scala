package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Efraimidis–Spirakis laws: exactly-n shape, the w/Σw selection
  * frequency at n = 1 (measured over many independent groups — each
  * group's hash coordinates are fresh randomness), weight
  * monotonicity, and partitioning invariance.
  */
class WeightedSampleKSpec extends SparkSpec {
  import spark.implicits._

  test("n=1 selection frequency tracks w/Σw across 600 groups") {
    // per group: one heavy item (w=4) + three light (w=1). Expected
    // heavy-win rate 4/7 ≈ 0.571.
    val rows = for (g <- 0 until 600; i <- 0 until 4) yield
      (g.toLong * 10 + i, s"g$g", if (i == 0) 4.0 else 1.0)
    val df = rows.toDF("id", "grp", "w")
    val picked = Sampling.weightedSampleK(df, "id", Seq("grp"), "w", n = 1)
    assert(picked.count() === 600)
    val heavyWins = picked.filter(col("id") % 10 === 0).count()
    val rate = heavyWins.toDouble / 600
    assert(rate > 0.47 && rate < 0.67, s"heavy-win rate $rate, expected ~0.571")
  }

  test("uniform weights reduce to an unbiased draw (~1/4 each)") {
    val rows = for (g <- 0 until 600; i <- 0 until 4) yield
      (g.toLong * 10 + i, s"g$g", 1.0)
    val picked = Sampling.weightedSampleK(rows.toDF("id", "grp", "w"),
      "id", Seq("grp"), "w", n = 1)
    val firstWins = picked.filter(col("id") % 10 === 0).count().toDouble / 600
    assert(firstWins > 0.15 && firstWins < 0.35, s"rate $firstWins")
  }

  test("exactly-n shape with dense ranks; small groups keep all rows") {
    val df = Seq((1L, "a", 1.0), (2L, "a", 1.0), (3L, "a", 2.0),
      (4L, "b", 1.0)).toDF("id", "grp", "w")
    val out = Sampling.weightedSampleK(df, "id", Seq("grp"), "w", n = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.count(_._1 == "a") === 2)
    assert(out.count(_._1 == "b") === 1)
    assert(out.filter(_._1 == "a").map(_._2).sorted.toSeq === Seq(1L, 2L))
  }

  test("partitioning invariance") {
    val rows = (0 until 200).map(i =>
      (i.toLong, s"g${i % 7}", 0.5 + (i % 5) * 0.3))
    def run(p: Int) = Sampling.weightedSampleK(
      rows.toDF("id", "grp", "w").repartition(p),
      "id", Seq("grp"), "w", n = 5)
      .orderBy("grp", "rnk").collect().map(_.toSeq).toSeq
    assert(run(2) === run(9))
  }
}
