package graft.dedup

import graft.SparkSpec

class SpanScrubSpec extends SparkSpec {
  import spark.implicits._

  // w=3 keeps fixtures hand-checkable; minDocs=2 throughout
  private def scrub(df: org.apache.spark.sql.DataFrame) =
    Dedup.scrubDuplicateSpans(df, "id", "text", w = 3, minDocs = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq

  test("tokens covered by a shared span are removed, others survive in order") {
    val docs = Seq(
      (1L, "alpha beta gamma delta unique1"),
      (2L, "prefix2 alpha beta gamma tail2")).toDF("id", "text")
    val out = scrub(docs)
    // "alpha beta gamma" is the only 3-token span in both docs; its
    // three tokens vanish from each, everything else keeps its order
    assert(out == Seq(
      (1L, "delta unique1", 2L, 3L),
      (2L, "prefix2 tail2", 2L, 3L)))
  }

  test("overlapping shared spans merge their coverage instead of double-dropping") {
    // docs share the 4-token run "a b c d" = two overlapping 3-spans;
    // coverage is the union [a..d], so exactly 4 tokens drop per doc
    val docs = Seq(
      (1L, "a b c d x1 y1"),
      (2L, "z2 a b c d w2")).toDF("id", "text")
    val out = scrub(docs)
    assert(out == Seq(
      (1L, "x1 y1", 2L, 4L),
      (2L, "z2 w2", 2L, 4L)))
  }

  test("a document that is entirely boilerplate survives with empty text") {
    val docs = Seq(
      (1L, "dup dup dup"),
      (2L, "dup dup dup"),
      (3L, "fresh only here")).toDF("id", "text")
    val out = scrub(docs)
    assert(out == Seq(
      (1L, "", 0L, 3L),
      (2L, "", 0L, 3L),
      (3L, "fresh only here", 3L, 0L)))
  }

  test("documents shorter than the span width pass through untouched") {
    val docs = Seq(
      (1L, "one two"),
      (2L, "one two")).toDF("id", "text")
    val out = scrub(docs)
    assert(out == Seq(
      (1L, "one two", 2L, 0L),
      (2L, "one two", 2L, 0L)))
  }

  test("within-document repetition alone does not trigger removal") {
    // the span repeats INSIDE doc 1 only; document frequency is 1,
    // below minDocs=2 (the per-doc-distinct df definition spanProfile
    // uses), so nothing is scrubbed
    val docs = Seq(
      (1L, "r r r r r r"),
      (2L, "other text entirely here now")).toDF("id", "text")
    val out = scrub(docs)
    assert(out.map(o => (o._1, o._4)) == Seq((1L, 0L), (2L, 0L)))
  }

  test("agrees with spanProfile on which documents carry duplicated spans") {
    val docs = Seq(
      (1L, "shared span of four x1 a b"),
      (2L, "shared span of four y2 c d"),
      (3L, "totally different content here")).toDF("id", "text")
    val dropped = scrub(docs).map(o => o._1 -> (o._4 > 0)).toMap
    val flagged = Dedup.spanProfile(docs, "id", "text", w = 3, minDocs = 2)
      .select($"id", $"n_dup" > 0).as[(Long, Boolean)].collect().toMap
    assert(dropped == flagged)
  }
}
