package graft.text

import graft.SparkSpec

class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("bigram scores are exact quantized conditional log-probs") {
    // corpus bigrams: doc1 → "a b","b a","a c"; doc4 → "a b"
    // counts: c(a b)=2, c(b a)=1, c(a c)=1; left counts: a·=3, b·=1
    // p(b|a)=2/3, p(a|b)=1, p(c|a)=1/3
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "x"),     // one token: no bigram
      (3L, ""),      // no tokens
      (4L, "a b")
    ).toDF("doc_id", "text")
    val got = BigramLm.score(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    graft.CacheRegistry.releaseAll()

    // quantized: round(ln(2/3)*1e6) = -405465, round(ln(1/3)*1e6) = -1098612
    assert(got(1L) === ((3L, -0.501359))) // (-405465 + 0 - 1098612)/3/1e6
    assert(got(4L) === ((1L, -0.405465)))
    assert(got(2L) === ((0L, 0.0)))       // bigram-less docs survive
    assert(got(3L) === ((0L, 0.0)))
  }

  test("word order changes the bigram score where unigram cannot see it") {
    // both docs have identical token MULTISETS — unigram LM scores them
    // identically; the scrambled one uses low-probability transitions
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat on the mat"),
      (2L, "the the cat cat sat sat on on the the mat mat")
    ).toDF("doc_id", "text")
    val bg = BigramLm.score(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    graft.CacheRegistry.releaseAll()
    val ug = UnigramLm.score(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    graft.CacheRegistry.releaseAll()
    assert(ug(1L) === ug(2L))   // unigram is order-blind
    assert(bg(1L) > bg(2L))     // bigram rewards the fluent ordering
  }
}
