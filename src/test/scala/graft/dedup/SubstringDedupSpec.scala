package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("a 60-token duplicate straddling a paragraph boundary is scrubbed " +
    "from the later document — where paragraph dedup provably misses it") {
    // the duplicated passage crosses a \n\n boundary: 30 tokens on
    // each side, embedded in DIFFERENT surrounding text per document
    // (prefixes chosen so no token collides across the two halves —
    // "dup"+i vs "dup2"+i would alias dup21..dup29 and make the
    // passage internally self-duplicating)
    val passage = toks("dupaa", 30) + "\n\n" + toks("dupbb", 30)
    val docs = Seq(
      (1L, toks("intro", 10) + " " + passage + " " + toks("tailA", 10)),
      (2L, toks("other", 10) + " " + passage + " " + toks("tailB", 10))
    ).toDF("doc_id", "text")

    // ParagraphDedup misses it: each document's cells differ (the
    // passage halves are glued to different neighbors), so doc 2
    // keeps every dup token
    val para = ParagraphDedup.dedupParagraphs(docs, "doc_id", "text", "\n\n")
      .filter($"doc_id" === 2L).select($"text_dedup").as[String].head()
    assert(para.contains("dupaa1 ") && para.contains("dupbb30"),
      s"fixture broken: paragraph dedup unexpectedly caught the straddle")

    // SubstringDedup catches it: doc 2 loses exactly the 60 passage
    // tokens, doc 1 (the first occurrence) keeps everything
    val out = SubstringDedup.dedupSubstrings(docs, "doc_id", "text", w = 8)
      .select($"doc_id", $"text_dedup", $"n_tokens", $"n_kept", $"n_dropped")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._5 === 0L, "first occurrence must be untouched")
    assert(out(1L)._2 === docs.filter($"doc_id" === 1L)
      .select(graft.text.TextAnalysis.tokens($"text")).as[Seq[String]]
      .head().mkString(" "))
    assert(out(2L)._5 === 60L,
      s"expected exactly the 60 straddling tokens dropped: ${out(2L)}")
    assert(!out(2L)._2.contains("dup"), s"passage survived: ${out(2L)._2}")
    assert(out(2L)._2.startsWith("other1") && out(2L)._2.endsWith("tailB10"))
  }

  test("duplicateSpans reports the maximal merged extent, not windows") {
    val passage = toks("x", 20)
    val docs = Seq(
      (1L, toks("a", 5) + " " + passage),
      (2L, toks("b", 7) + " " + passage + " " + toks("c", 4))
    ).toDF("doc_id", "text")
    val spans = SubstringDedup.duplicateSpans(docs, "doc_id", "text", w = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    // one maximal 20-token extent in doc 2 at positions [7, 27) —
    // the 13 overlapping windows merged into a single island
    assert(spans === Set((2L, 7L, 27L, 20L)))
  }

  test("within-document repeats keep only the first copy") {
    val run = toks("r", 10)
    val docs = Seq((5L, run + " " + toks("mid", 3) + " " + run))
      .toDF("doc_id", "text")
    val out = SubstringDedup.dedupSubstrings(docs, "doc_id", "text", w = 8)
      .select($"text_dedup", $"n_kept", $"n_dropped")
      .as[(String, Long, Long)].head()
    assert(out._3 === 10L, s"second copy must drop: $out")
    assert(out._1 === run + " " + toks("mid", 3))
  }

  test("runs shorter than w are invisible; every doc survives the output") {
    val short = toks("s", 5) // below w=8 — must NOT be deduped
    val docs = Seq(
      (1L, short + " " + toks("u1", 6)),
      (2L, short + " " + toks("u2", 6)),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.dedupSubstrings(docs, "doc_id", "text", w = 8)
      .select($"doc_id", $"n_dropped").as[(Long, Long)].collect().toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out.values.forall(_ === 0L), s"sub-w run was deduped: $out")
  }

  test("token accounting: n_kept + n_dropped = n_tokens everywhere") {
    val docs = Seq(
      (1L, toks("p", 12) + " " + toks("q", 9)),
      (2L, toks("p", 12)),
      (3L, toks("q", 9) + " " + toks("p", 12))
    ).toDF("doc_id", "text")
    val bad = SubstringDedup.dedupSubstrings(docs, "doc_id", "text", w = 8)
      .filter($"n_kept" + $"n_dropped" =!= $"n_tokens").count()
    assert(bad === 0L)
  }

  test("plan shape: no global window, no single-partition exchange") {
    val docs = Seq((1L, toks("z", 30))).toDF("doc_id", "text")
    val plan = SubstringDedup.dedupSubstrings(docs, "doc_id", "text", w = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single partition:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
    // duplicateSpans' island merge is allowed its PER-DOCUMENT window
    val plan2 = SubstringDedup.duplicateSpans(docs, "doc_id", "text", w = 8)
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("SinglePartition"), s"single partition:\n$plan2")
  }
}
