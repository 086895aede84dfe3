package graft.sketch

import graft.SparkSpec
import graft.functions.HeavyHittersAgg
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  /** zipf-ish skew: item i appears ~3000/i times, i = 1..40 */
  private def skewed = (1 to 40).flatMap(i =>
    Seq.fill(3000 / i)(i.toLong)).toDF("item")

  test("exact heavy hitters equals the naive group-by at several thresholds") {
    for ((k, frac) <- Seq((64, 1.0 / 64), (128, 1.0 / 128), (16, 1.0 / 8))) {
      val n = skewed.count()
      val naive = skewed.groupBy($"item").agg(count(lit(1)).as("n_occ"))
        .filter($"n_occ" >= n * frac)
        .as[(Long, Long)].collect().toSet
      val viaSketch = HeavyHitters.exactHeavyHitters(skewed, "item", k, frac)
        .as[(Long, Long)].collect().toSet
      assert(viaSketch === naive, s"mismatch at k=$k frac=$frac")
    }
  }

  test("candidate set is a superset of true heavies under any partitioning") {
    val n = skewed.count()
    for (parts <- Seq(1, 7, 32)) {
      val (cands, total) = HeavyHitters.candidates(
        skewed.repartition(parts), "item", k = 32)
      assert(total === n)
      assert(cands.length <= 32)
      val trueHeavies = skewed.groupBy($"item").count()
        .filter($"count" > n / 33.0).as[(Long, Long)].collect().map(_._1)
      assert(trueHeavies.toSet.subsetOf(cands.toSet),
        s"parts=$parts missed ${trueHeavies.toSet -- cands.toSet}")
    }
  }

  test("incremental candidates across batches keep the superset guarantee") {
    // three daily batches with different item mixes; item 1 is heavy
    // overall but NOT within every single batch
    val batches = Seq(
      (1 to 3000).map(i => if (i % 4 == 0) 1L else (100 + i % 500).toLong),
      (1 to 3000).map(i => if (i % 5 == 0) 1L else (700 + i % 500).toLong),
      (1 to 3000).map(i => if (i % 3 == 0) 2L else (1300 + i % 500).toLong)
    ).map(_.toDF("item"))
    val k = 32
    val state = batches.map(HeavyHitters.candidateWeights(_, "item", k))
      .reduce(HeavyHitters.mergeCandidateSets(_, _, k))
    assert(state.size <= k)
    val union = batches.reduce(_ unionByName _)
    val n = union.count()
    val trueHeavies = union.groupBy($"item").count()
      .filter($"count" > n / (k + 1.0)).as[(Long, Long)].collect().map(_._1)
    assert(trueHeavies.nonEmpty && trueHeavies.toSet.subsetOf(
      state.map(_._1).toSet),
      s"missed ${trueHeavies.toSet -- state.map(_._1).toSet}")
    // exact recount of the merged candidates equals the naive answer
    val viaState = union
      .filter($"item".isin(state.map(x => Long.box(x._1)): _*))
      .groupBy($"item").agg(count(lit(1)).as("n_occ"))
      .filter($"n_occ" >= n / k.toDouble)
      .as[(Long, Long)].collect().toSet
    val naive = union.groupBy($"item").agg(count(lit(1)).as("n_occ"))
      .filter($"n_occ" >= n / k.toDouble).as[(Long, Long)].collect().toSet
    assert(viaState === naive)
  }

  test("sketch state stays bounded on a wide near-uniform domain") {
    val wide = (1L to 50000L).toDF("item") // every item distinct
    val (cands, total) = HeavyHitters.candidates(wide, "item", k = 64)
    assert(total === 50000L)
    assert(cands.length <= 64)
    // and no item qualifies at any frac ≥ guarantee
    assert(HeavyHitters.exactHeavyHitters(wide, "item", 64, 1.0 / 64)
      .isEmpty)
  }

  test("nulls are not items; guarantee precondition is enforced") {
    val withNulls = Seq[java.lang.Long](1L, 1L, 1L, null, 2L)
      .toDF("item")
    val (cands, total) = HeavyHitters.candidates(withNulls, "item", 8)
    assert(total === 4L) // count(col) skips the null
    assert(cands.toSet === Set(1L, 2L))
    intercept[IllegalArgumentException] {
      HeavyHitters.exactHeavyHitters(withNulls, "item", 8, 1.0 / 100)
    }
  }

  test("single-partition counters are exact for ≤ k distinct items") {
    val df = Seq(5L, 5L, 7L, 5L, 7L, 9L).toDF("item").coalesce(1)
    val row = df.agg(HeavyHittersAgg.misra_gries($"item", 8).as("c")).head()
    val pairs = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getLong(0), r.getLong(1)))
    // weight DESC, item ASC
    assert(pairs === Seq((5L, 3L), (7L, 2L), (9L, 1L)))
  }
}
