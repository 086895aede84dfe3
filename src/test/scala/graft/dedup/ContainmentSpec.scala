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
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
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
