package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // planted corpora: natural-prose GOOD docs (stopword-rich, healthy
  // length) vs spam BAD docs (keyword stuffing, no stopwords, digit
  // and punctuation noise) — the separation task a quality classifier
  // exists for
  private def planted(n: Int) = {
    val good = (0 until n).map { i =>
      (i.toLong, ("the quick brown fox jumps over the lazy dog and " +
        "it is a fine day for a walk in the park with friends ") * 3, 1)
    }
    val bad = (0 until n).map { i =>
      (n + i.toLong, ("buy cheap pills 4711%%% $$$ click9 " +
        s"www$i!!! 00${i}77 discount##== ") * 3, 0)
    }
    (good ++ bad).toDF("doc_id", "text", "label")
  }

  test("separates planted good/bad corpora") {
    val docs = planted(40)
    val out = QualityClassifier.fitScore(docs, col("text"),
      col("label").cast(IntegerType), keep = Seq(col("doc_id")))
      .collect()
    assert(out.length === 80)
    val acc = out.count(r =>
      r.getAs[Int]("pred") === r.getAs[Int]("y")) / 80.0
    assert(acc === 1.0,
      s"planted corpora must separate perfectly, got $acc")
    // and scores actually spread across the boundary, not cluster at it
    val goodMin = out.filter(_.getAs[Int]("y") == 1)
      .map(_.getAs[Double]("score")).min
    val badMax = out.filter(_.getAs[Int]("y") == 0)
      .map(_.getAs[Double]("score")).max
    assert(goodMin > badMax + 0.05,
      s"margin collapsed: good min $goodMin vs bad max $badMax")
  }

  test("training is bit-deterministic across partitionings") {
    val docs = planted(25)
    val m1 = QualityClassifier.fit(docs.repartition(1), col("text"),
      col("label"))
    val m7 = QualityClassifier.fit(docs.repartition(7, col("doc_id")),
      col("text"), col("label"))
    assert(m1.wMicro === m7.wMicro,
      "integer gradient sums must make training partitioning-invariant")
    // weights moved — training actually happened
    assert(m1.wMicro.exists(_ != 0L))
  }

  test("scoring is a narrow literal-weight pass (no shuffle, codegen)") {
    val docs = planted(10)
    val m = QualityClassifier.Model(
      IndexedSeq(-100000L, 4000000L, 2000000L, -3000000L, -3000000L, 0L))
    val df = QualityClassifier.score(docs, col("text"), m,
      keep = Seq(col("doc_id")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    val rows = df.collect()
    assert(rows.length === 10 * 2)
    // score formula spot-check on a degenerate row: empty text →
    // features (1, 0, 0, 0, 0, 0) → z = w0/1e6 scaled = -0.0001·…
    val one = QualityClassifier.score(
      Seq((1L, "")).toDF("doc_id", "text"), col("text"), m,
      keep = Seq(col("doc_id"))).collect().head
    val z = -100000L.toDouble * 1000000L / 1e12
    val expect = BigDecimal(0.5 + z / (2.0 * (1.0 + math.abs(z))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(one.getAs[Double]("score") === expect)
  }

  test("fixed-point discipline: weight update rounds away from zero") {
    // a gradient mean landing exactly on ±.5 must round away from
    // zero in BOTH engines; Math.round would round -2.5 to -2 and
    // silently fork the trajectory from the oracle. Exercised via a
    // 2-doc corpus tuned so lr·G/n hits an exact half.
    val docs = Seq(
      (0L, "the the the the", 1),
      (1L, "zz", 0)).toDF("doc_id", "text", "label")
    val m = QualityClassifier.fit(docs, col("text"), col("label"),
      iters = 1, lr = 1.0)
    // round 1: z=0 → σ=0.5, err = ∓0.5; bias gradient
    // G0 = round(-0.5·1e6) + round(0.5·1e6) = 0 → w0 stays 0;
    // stop-ratio f1: doc0 = 1e6 (all stopwords), doc1 = 0
    // G1 = round(-0.5·1e6) = -500000, n=2 → lr·G/n = -250000 exactly
    // → w1 = 0 - (-250000) = 250000
    assert(m.wMicro(0) === 0L)
    assert(m.wMicro(1) === 250000L)
  }
}
