package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val big =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"

  test("embedded quote scores containment 1.0 where Jaccard stays low") {
    val quote = "zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, big + " " + big.split(' ').reverse.mkString(" ")), // 2× length
      (2L, quote),
      (3L, "unrelated words entirely different from anything else here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
        w = 3, minContain = 0.9, dfCap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    // every 3-shingle of the quote appears in doc 1 → contain(2⊆1) = 1.0
    assert(pairs((2L, 1L)) === 1.0)
    // the reverse direction has a much bigger denominator — gated out
    assert(!pairs.contains((1L, 2L)))
    // symmetric Jaccard on the same pair is far below the signal
    val j = Dedup.ngramJaccardPairs(docs.withColumn("blk", lit(1)),
        "doc_id", "text", Seq("blk"), w = 3, threshold = 0.0)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .collect().head.getDouble(2)
    assert(j < 0.3, s"jaccard $j unexpectedly high")
  }

  test("mutual containment exposes both denominators for tiebreaking") {
    // near-identical docs contain each other; a consumer dropping
    // every src would annihilate both copies — n_src/n_dst must ride
    // along so exactly one side can be picked deterministically
    val docs = Seq((1L, big), (2L, big)).toDF("doc_id", "text")
    val rows = Dedup.containmentPairs(docs, "doc_id", "text",
        w = 3, minContain = 0.9, dfCap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.length === 2)
    for ((src, dst, nSrc, nDst, c) <- rows) {
      assert(c === 1.0, s"($src,$dst)")
      assert(nSrc === nDst)
    }
    // the v5 tiebreak (drop smaller n, ties by higher id) keeps doc 1
    val dropped = rows.filter { case (s, dd, nS, nD, _) =>
      nS < nD || (nS == nD && s > dd)
    }
    assert(dropped.map(_._1).toSet === Set(2L))
  }

  test("df-capped boilerplate shingles create no pairs") {
    // the SAME boilerplate line in every doc, unique tails: with
    // dfCap below the corpus size the shared shingles are dropped and
    // no pair survives
    val docs = (1L to 12L).map(i =>
      (i, s"common header line repeated across documents plus unique tail $i marker $i"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text",
      w = 3, minContain = 0.1, dfCap = 8)
    assert(out.count() === 0L)
  }
}
