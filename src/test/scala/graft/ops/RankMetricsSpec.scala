package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RankMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: (Double, Int)*): (Long, Long, Double, Double) =
    RankMetrics.binaryAuc(rows.toSeq.toDF("score", "y"),
      col("score"), col("y"))
      .as[(Long, Long, Double, Double)].collect().head

  /** Brute-force pair-counting definition: P(pos > neg) + ½·P(tie). */
  private def brute(rows: Seq[(Double, Int)]): Double = {
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val s = (for (p <- pos; n <- neg) yield {
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    }).sum
    s / (pos.size.toDouble * neg.size.toDouble)
  }

  test("perfect separation scores 1.0, inverted scores 0.0") {
    assert(auc((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)) ===
      ((2L, 2L, 1.0, 1.0)))
    assert(auc((0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)) ===
      ((2L, 2L, 0.0, -1.0)))
  }

  test("all-tied scores give AUC 0.5 (gini 0)") {
    assert(auc((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)) ===
      ((2L, 2L, 0.5, 0.0)))
  }

  test("tie-aware mid-ranks match the pair-counting definition") {
    // mixed ties across and within classes
    val rows = Seq((0.3, 0), (0.3, 1), (0.7, 1), (0.7, 0), (0.7, 1),
      (0.1, 0), (0.9, 1), (0.5, 0))
    val (np, nn, a, g) = auc(rows: _*)
    assert((np, nn) === ((4L, 4L)))
    assert(a === math.rint(brute(rows) * 1e6) / 1e6)
    assert(g === math.rint((2 * brute(rows) - 1) * 1e6) / 1e6)
  }

  test("matches brute force on a pseudo-random scored set") {
    val rows = (0 until 200).map { i =>
      val s = ((i * 7919 + 13) % 21) / 20.0 // heavy ties: 21 levels
      val y = if ((i * 104729 + 7) % 100 < 30 + (s * 40).toInt) 1 else 0
      (s, y)
    }
    val (_, _, a, _) = auc(rows: _*)
    assert(a === math.rint(brute(rows) * 1e6) / 1e6)
  }

  private def ap(rows: (Double, Int)*): (Long, Long, Double) =
    RankMetrics.averagePrecision(rows.toSeq.toDF("score", "y"),
      col("score"), col("y"))
      .as[(Long, Long, Double)].collect().head

  /** sklearn step-sum replay at distinct-score thresholds, with the
    * engine's nano-unit per-term quantization.
    */
  private def bruteAp(rows: Seq[(Double, Int)]): Double = {
    val p = rows.count(_._2 == 1).toDouble
    val groups = rows.groupBy(_._1).toSeq.sortBy(-_._1)
    var cumTp = 0L; var cumN = 0L; var nano = 0L
    for ((_, g) <- groups) {
      val tp = g.count(_._2 == 1)
      cumTp += tp; cumN += g.size
      nano += math.rint(tp / p * (cumTp.toDouble / cumN) * 1e9).toLong
    }
    math.rint(nano / 1e9 * 1e6) / 1e6
  }

  test("AP: perfect ranking = 1.0; random-tied = prevalence") {
    assert(ap((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)) === ((2L, 2L, 1.0)))
    // one tied block: AP = precision of the block = positive rate
    assert(ap((0.5, 1), (0.5, 0), (0.5, 0), (0.5, 0)) ===
      ((1L, 3L, 0.25)))
  }

  test("AP matches the sklearn step-sum replay under heavy ties") {
    val rows = (0 until 200).map { i =>
      val s = ((i * 7919 + 13) % 21) / 20.0
      val y = if ((i * 104729 + 7) % 100 < 30 + (s * 40).toInt) 1 else 0
      (s, y)
    }
    val (np, nn, a) = ap(rows: _*)
    assert(np === rows.count(_._2 == 1).toLong)
    assert(nn === rows.count(_._2 == 0).toLong)
    assert(a === bruteAp(rows))
  }
}
