package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureOptimizerSpec extends SparkSpec {
  import spark.implicits._

  // planted losses in micro-nats: hard ≫ medium ≫ easy
  private def perDoc = Seq.tabulate(300) { i =>
    val dom = i % 3 match {
      case 0 => ("easy", 1000000L + (i % 5) * 1000L)
      case 1 => ("medium", 3000000L + (i % 5) * 1000L)
      case 2 => ("hard", 6000000L + (i % 5) * 1000L)
    }
    dom
  }.toDF("domain", "lm")

  test("multiplicative weights upweight the hard domain, ordering strict") {
    val out = MixtureOptimizer.optimize(perDoc, "domain", "lm")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out("easy")._1 === 100L)
    // mean losses reproduce the plant (micro-rounded)
    assert(math.abs(out("hard")._2 - 6.002) < 0.001)
    // strict ordering and real separation after 5 rounds
    assert(out("hard")._3 > out("medium")._3)
    assert(out("medium")._3 > out("easy")._3)
    assert(out("hard")._3 > 2 * out("easy")._3,
      "five rounds of 6:1 loss ratio must separate weights decisively")
    // shares renormalize to 1 within per-domain rounding slack
    val s = out.values.map(_._3).sum
    assert(math.abs(s - 1.0) < 3e-6)
  }

  test("weights are partitioning-invariant") {
    val a = MixtureOptimizer.optimize(perDoc.repartition(1), "domain", "lm")
      .orderBy("domain").collect().toSeq
    val b = MixtureOptimizer.optimize(perDoc.repartition(13), "domain", "lm")
      .orderBy("domain").collect().toSeq
    assert(a === b)
  }

  test("uniform losses stay (near-)uniform through every round") {
    val flat = Seq.tabulate(60)(i => (s"d${i % 4}", 2500000L))
      .toDF("domain", "lm")
    val w = MixtureOptimizer.optimize(flat, "domain", "lm")
      .select($"weight").as[Double].collect()
    assert(w.forall(x => math.abs(x - 0.25) < 1e-5))
  }
}
