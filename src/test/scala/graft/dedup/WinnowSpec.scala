package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def prints(texts: (Long, String)*): Map[Long, Seq[Long]] =
    texts.toSeq.toDF("doc_id", "text")
      .select($"doc_id", Winnow.winnowedPrints($"text").as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("degenerate sizes: <k tokens none, <w grams pick the global min") {
    val p = prints(
      (1L, "a b"),            // 2 tokens < k=3 → no grams → no prints
      (2L, "a b c"),          // 1 gram → its own min
      (3L, "a b c d e f"),    // 4 grams = w → exactly one window
      (4L, ""))
    assert(p(1L).isEmpty && p(4L).isEmpty)
    assert(p(2L).length === 1)
    assert(p(3L).length === 1) // one w-window over 4 grams → one min
  }

  test("identical documents produce identical signatures; density is bounded") {
    val text = (1 to 60).map(i => s"tok${i % 17}").mkString(" ")
    val p = prints((1L, text), (2L, text), (3L, (1 to 60).map(i => s"other$i").mkString(" ")))
    assert(p(1L) === p(2L))
    assert(p(1L) !== p(3L))
    // selection keeps ~2/(w+1) of grams (58 grams, w=4 → expect ~23;
    // distinct-value collapse can only shrink it)
    assert(p(3L).nonEmpty && p(3L).length <= 58)
    // sorted distinct contract
    assert(p(3L) === p(3L).distinct.sorted)
  }

  test("overlap candidates pair the embedding docs, not the unrelated one") {
    val shared = (1 to 30).map(i => s"common$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"one two three four five $shared six seven"),
      (3L, "completely unrelated content with no overlap at all here"))
      .toDF("doc_id", "text")
    val pairs = Winnow.overlapCandidates(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    graft.CacheRegistry.releaseAll()
    assert(pairs.keySet === Set((1L, 2L)))
    assert(pairs((1L, 2L)) >= 3) // the shared run's interior prints
  }

  test("the winnowing guarantee: a shared long run yields shared prints") {
    // doc 1 and doc 2 share a 30-token run embedded in different
    // surroundings (≥ w+k-1 = 6 tokens shared ⇒ ≥ 1 shared print)
    val shared = (1 to 30).map(i => s"common$i").mkString(" ")
    val p = prints(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"one two three four five $shared six seven"),
      (3L, "completely unrelated content with no overlap at all here"))
    val inter12 = p(1L).toSet intersect p(2L).toSet
    assert(inter12.nonEmpty, "shared run must contribute shared prints")
    assert((p(1L).toSet intersect p(3L).toSet).isEmpty)
    // most of the shared run's interior prints coincide — the signal a
    // partial-overlap join keys on
    assert(inter12.size >= 3)
  }
}
