package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AllPairsSpec extends SparkSpec {
  import spark.implicits._

  private def run(threshold: Double, texts: (Long, String)*): Map[(Long, Long), Double] = {
    val out = AllPairs.pairs(texts.toSeq.toDF("doc_id", "text"),
        "doc_id", "text", threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    graft.CacheRegistry.releaseAll()
    out
  }

  /** Brute-force exact Jaccard over distinct whitespace tokens. */
  private def bruteforce(threshold: Double, texts: (Long, String)*): Map[(Long, Long), Double] = {
    val sets = texts.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).toSet }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib && sa.nonEmpty && sb.nonEmpty
      j = (sa & sb).size.toDouble / (sa | sb).size
      if j >= threshold
    } yield (ia, ib) ->
      BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
  }

  test("matches brute force on a mixed corpus (no false negatives)") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",   // 1 token swap
      3L -> "the quick brown fox leaps over the lazy dog today",
      4L -> "completely different content about spark engines",
      5L -> "content about spark engines completely different", // permutation of 4
      6L -> "one two three four five six seven eight nine ten",
      7L -> "one two three four five six seven eight nine",    // subset of 6
      8L -> "")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      assert(run(t, docs: _*) === bruteforce(t, docs: _*), s"threshold $t")
    }
  }

  test("permuted documents are exact duplicates (jaccard 1.0)") {
    val p = run(0.9,
      4L -> "completely different content about spark engines",
      5L -> "content about spark engines completely different")
    assert(p === Map((4L, 5L) -> 1.0))
  }

  test("duplicate tokens collapse: jaccard is over DISTINCT token sets") {
    val p = run(0.5,
      1L -> "a a a a a a b",
      2L -> "a b b b")
    assert(p === Map((1L, 2L) -> 1.0))
  }

  test("threshold boundary is inclusive") {
    // sets {a,b,c,d} vs {a,b,c,e}: |∩|=3, |∪|=5 → j=0.6 exactly
    val docs = Seq(1L -> "a b c d", 2L -> "a b c e")
    assert(run(0.6, docs: _*).keySet === Set((1L, 2L)))
    assert(run(0.601, docs: _*).isEmpty)
  }
}
