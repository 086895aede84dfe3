package graft.text

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learns the classic merges on a planted corpus") {
    // "low low low lower newest newest": most frequent pair is (l,o)
    // weight 4, then (lo,w) weight 4 after the first merge, ...
    val docs = Seq((1L, "low low low lower newest newest widest"))
      .toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", steps = 3)
    assert(m.map(x => (x.lhs, x.rhs)) == Seq(("l", "o"), ("lo", "w"),
      ("e", "s")),
      s"unexpected merges: $m")
    assert(m.head.weight == 4L) // 'lo' appears in low×3 + lower×1
  }

  test("leftmost-first non-overlapping application on runs") {
    // corpus "aaa aaa": pair (a,a) has weight 4 (two per word);
    // after merging, words are [aa, a] so round 2 merges (aa, a)
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", steps = 2)
    assert(m(0).lhs == "a" && m(0).rhs == "a" && m(0).weight == 4L)
    assert(m(1).lhs == "aa" && m(1).rhs == "a" && m(1).weight == 2L)
  }

  test("stops early when the corpus runs out of pairs") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", steps = 5)
    // round 1 merges (a,b); single-symbol words have no pairs left
    assert(m.size == 1 && m.head.lhs == "a" && m.head.rhs == "b")
  }

  test("encode reports exact subword counts under the learned merges") {
    val docs = Seq((1L, "low low lower"), (2L, ""), (3L, "xyz"))
      .toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", steps = 2) // (l,o) then (lo,w)
    assert(m.map(x => (x.lhs, x.rhs)) == Seq(("l", "o"), ("lo", "w")))
    val out = Bpe.encode(docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // low → [low] (1 subword); lower → [low, e, r] (3)
    assert(out(1L) == (3L, 1L + 1L + 3L))
    assert(out(2L) == (0L, 0L))
    assert(out(3L) == (1L, 3L)) // xyz untouched by the merges
  }

  test("batched training equals sequential when picked pairs are disjoint") {
    // (l,o) and (e,s) dominate and share no symbol: one batched round
    // of 2 must reproduce two sequential rounds
    val docs = Seq((1L, "low low low lo estes estes es"))
      .toDF("doc_id", "text")
    val seq2 = Bpe.train(docs, "text", steps = 2)
      .map(m => (m.lhs, m.rhs, m.weight))
    val bat2 = Bpe.trainBatched(docs, "text", steps = 1, batch = 2)
      .map(m => (m.lhs, m.rhs, m.weight))
    assert(seq2.toSet == bat2.toSet, s"seq=$seq2 bat=$bat2")
  }

  test("batched training skips overlapping pairs within a round") {
    // "aaa aaa": (a,a) picked first; any other a-pair overlaps it, so
    // the round must not also merge (aa,a) with stale counts
    val docs = Seq((1L, "aaa aaa")).toDF("doc_id", "text")
    val m = Bpe.trainBatched(docs, "text", steps = 1, batch = 2)
    assert(m.map(x => (x.lhs, x.rhs)) == Seq(("a", "a")))
  }

  test("encode conserves the character stream: subwords partition each word") {
    // for every doc: n_tokens <= n_subwords <= n_chars-without-spaces,
    // and merges only ever shrink the subword count, never below one
    // per token — the segmentation-partition invariant
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(200)
      .select($"doc_id", $"text")
    val m = Bpe.train(docs, "text", steps = 3)
    val joined = Bpe.encode(docs, "doc_id", "text", m)
      .join(docs, "doc_id")
      .selectExpr("n_tokens", "n_subwords",
        "length(regexp_replace(text, '\\\\s+', '')) AS n_chars")
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nt, ns, nc) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(nt <= ns && ns <= nc, s"violated: tokens=$nt sub=$ns chars=$nc")
    }
  }

  test("ties break lexicographically") {
    val docs = Seq((1L, "zx ba zx ba")).toDF("doc_id", "text")
    val m = Bpe.train(docs, "text", steps = 1)
    // (b,a) and (z,x) both weight 2: lexicographic pick is (b,a)
    assert(m.head.lhs == "b" && m.head.rhs == "a")
  }
}
