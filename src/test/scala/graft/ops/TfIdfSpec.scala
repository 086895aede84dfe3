package graft.ops

import graft.SparkSpec
import graft.sim.TfIdf

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("identical documents score cosine 1.0; disjoint ones never pair") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val got = TfIdf.similarPairs(docs, "doc_id", "text",
      threshold = 0.1, maxDf = 10)
      .as[(Long, Long, Double)].collect().toSet
    graft.CacheRegistry.releaseAll()
    assert(got === Set((1L, 2L, 1.0)))
  }

  test("df-capped vocabulary drops ubiquitous tokens from the space") {
    // "common" appears in every doc; with maxDf=2 it leaves the
    // vocabulary, so docs 1 and 3 share nothing and only 1-2 pair
    val docs = Seq(
      (1L, "common rare1 rare2"),
      (2L, "common rare1 rare2"),
      (3L, "common other1 other2")
    ).toDF("doc_id", "text")
    val pairs = TfIdf.similarPairs(docs, "doc_id", "text",
      threshold = 0.01, maxDf = 2)
      .as[(Long, Long, Double)].collect().toSet
    graft.CacheRegistry.releaseAll()
    assert(pairs.map(p => (p._1, p._2)) === Set((1L, 2L)))
    // within the pruned space docs 1 and 2 are still identical vectors
    assert(pairs.head._3 === 1.0)
  }

  test("weights are deterministic fixed-point bigints") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val v1 = TfIdf.docVectors(docs, "doc_id", "text", 10).collect().toSet
    val v2 = TfIdf.docVectors(docs, "doc_id", "text", 10).collect().toSet
    assert(v1 === v2)
    assert(v1.nonEmpty)
  }
}
