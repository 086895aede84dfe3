package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("target-typical documents outweigh target-atypical ones") {
    // target slice speaks only "alpha beta"; raw background speaks
    // "gamma delta"; a fresh doc in target language must score higher
    // than a fresh doc in background language
    val docs = (
      (0L until 10L).map(i => (i, "alpha beta alpha beta", true)) ++
      (10L until 30L).map(i => (i, "gamma delta gamma delta", false)) ++
      Seq((100L, "alpha beta", false), (101L, "gamma delta", false))
    ).toDF("doc_id", "text", "tgt")
    val w = Dsir.importanceWeights(docs, "doc_id", "text", col("tgt"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(100L) > w(101L),
      s"target-like doc must outweigh background-like doc: $w")
  }

  test("feature-less documents survive with zero weight") {
    val docs = Seq((0L, "some words here", true), (1L, "   ", false),
      (2L, "", false)).toDF("doc_id", "text", "tgt")
    val out = Dsir.importanceWeights(docs, "doc_id", "text", col("tgt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 3)
    val empty = out.filter(_._1 >= 1L)
    assert(empty.forall(t => t._2 == 0L && t._3 == 0.0))
  }

  test("n_feats counts unigrams plus bigrams with multiplicity") {
    val docs = Seq((0L, "a b c a b", true)).toDF("doc_id", "text", "tgt")
    val out = Dsir.importanceWeights(docs, "doc_id", "text", col("tgt"))
      .collect().head
    // 5 unigrams + 4 bigrams
    assert(out.getLong(1) == 9L)
  }
}
