package graft.text

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "apple banana banana cherry"),
    (3L, "cherry cherry cherry durian"),
    (4L, "unrelated words entirely here")
  ).toDF("doc_id", "text")

  test("rarer terms dominate and matching docs rank first") {
    val qs = Seq(("q1", "durian"), ("q2", "apple")).toDF("query_id", "qtext")
    val out = Bm25.topK(docs, "doc_id", "text", qs, k = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    // durian appears only in doc 3 — sole hit
    assert(out.filter(_._1 == "q1").map(_._2).toSeq == Seq(3L))
    // apple: docs 1 and 2; doc 1 has higher tf and is shorter → rank 1
    val q2 = out.filter(_._1 == "q2").sortBy(_._3).map(_._2).toSeq
    assert(q2 == Seq(1L, 2L))
  }

  test("queries with only out-of-vocabulary terms return no rows") {
    val qs = Seq(("q1", "zzz qqq")).toDF("query_id", "qtext")
    assert(Bm25.topK(docs, "doc_id", "text", qs).count() == 0L)
  }

  test("k bounds the result and ranks are dense from 1") {
    val qs = Seq(("q1", "apple banana cherry")).toDF("query_id", "qtext")
    val out = Bm25.topK(docs, "doc_id", "text", qs, k = 2).collect()
    assert(out.length == 2 && out.map(_.getInt(3)).sorted.toSeq == Seq(1, 2))
  }
}
