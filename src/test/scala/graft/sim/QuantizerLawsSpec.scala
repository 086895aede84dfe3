package graft.sim

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property laws for the round-8 vector/text operators — generated
  * inputs instead of hand fixtures, pinning the invariants the
  * operators advertise rather than specific outputs.
  */
class QuantizerLawsSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long = 7L): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  private val vecGen: Gen[Array[Double]] =
    Gen.listOfN(8, Gen.chooseNum(-4.0, 4.0)).map(_.toArray)

  test("SQ8: power-of-two input scaling shifts scale, not codes") {
    // 2·x has exactly double the max-abs, so scale doubles and every
    // quotient v/scale is BIT-IDENTICAL (binary float exponent shift)
    // → codes must match exactly, not approximately
    val vs = samples(vecGen, 30).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .filter(_._2.exists(_ != 0.0))
    val base = vs.toDF("vec_id", "embedding")
    val doubled = vs.map { case (id, v) => (id, v.map(_ * 2.0)) }
      .toDF("vec_id", "embedding")
    def enc(df: org.apache.spark.sql.DataFrame) =
      ScalarQuantizer.encode(df, "vec_id", "embedding")
        .as[(Long, Double, String, Double)].collect()
        .map(t => t._1 -> t).toMap
    val a = enc(base); val b = enc(doubled)
    a.keys.foreach { id =>
      assert(b(id)._2 == a(id)._2 * 2.0, s"scale of $id")
      assert(b(id)._3 == a(id)._3, s"codes of $id")
    }
  }

  test("SQ8: codes are invariant to row order and partitioning") {
    val vs = samples(vecGen, 40).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val once = ScalarQuantizer
      .encode(vs.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .as[(Long, Double, String, Double)].collect().sortBy(_._1).toSeq
    val shuffled = ScalarQuantizer
      .encode(vs.reverse.toDF("vec_id", "embedding").repartition(7),
        "vec_id", "embedding")
      .as[(Long, Double, String, Double)].collect().sortBy(_._1).toSeq
    assert(once == shuffled)
  }

  private val wordGen: Gen[String] =
    Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
      "theta", "iota", "kappa")
  private val docGen: Gen[String] =
    Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" "))

  test("span scrub: token conservation — kept + dropped = tokenized length") {
    val docs = samples(docGen, 60, seed = 21).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val out = graft.dedup.Dedup
      .scrubDuplicateSpans(docs.toDF("id", "text"), "id", "text",
        w = 3, minDocs = 2)
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == docs.length)
    val tokCount = docs.map { case (id, t) =>
      id -> t.split("\\s+").count(_.nonEmpty).toLong
    }.toMap
    out.foreach { case (id, clean, kept, dropped) =>
      assert(kept + dropped == tokCount(id), s"doc $id conservation")
      assert(clean.split("\\s+").count(_.nonEmpty).toLong == kept,
        s"doc $id rebuilt text length")
    }
  }

  test("span scrub: a corpus of unique-vocabulary docs loses nothing") {
    // each doc draws from a disjoint vocabulary → no cross-document
    // span can repeat → scrub must be the identity on token content
    val docs = (0 until 12).map { i =>
      (i.toLong, (0 until 8).map(j => s"w${i}_$j").mkString(" "))
    }
    val out = graft.dedup.Dedup
      .scrubDuplicateSpans(docs.toDF("id", "text"), "id", "text",
        w = 3, minDocs = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    out.zip(docs).foreach { case ((_, clean, kept, dropped), (_, orig)) =>
      assert(clean == orig && dropped == 0L && kept == 8L)
    }
  }

  test("MMR: selection is a subset of the relevance pool, scores finite") {
    val vs = samples(vecGen, 25, seed = 5).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
    val df = vs.toDF("vec_id", "embedding")
    val q = samples(vecGen, 1, seed = 99).head.toSeq
    val poolIds = Ann.bruteForceTopK(df,
      Seq((999L, q.toArray)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 12)
      .select($"neighbor_id").as[Long].collect().toSet
    val picks = Mmr.selectDiverse(df, "vec_id", "embedding", q,
      k = 6, poolSize = 12, lambda = 0.6)
      .as[(Long, Long, Double)].collect()
    assert(picks.length == 6)
    picks.foreach { case (_, id, score) =>
      // bruteForceTopK excludes a same-id query row; 999 is foreign so
      // its top-12 IS the relevance pool MMR drew from
      assert(poolIds.contains(id), s"pick $id outside pool")
      assert(!score.isNaN && !score.isInfinite)
    }
  }
}
