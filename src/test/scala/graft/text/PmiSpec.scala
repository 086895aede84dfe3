package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PmiSpec extends SparkSpec {
  import spark.implicits._

  test("PMI matches the hand-computed collocation score") {
    // "new york" always together (3×); "of the" frequent but expected.
    val docs = Seq(
      "new york is big",
      "new york has of the crowds",
      "of the city of the state new york").toDF("text")
    val out = Pmi.phrases(docs, "text", minCount = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // corpus: tokens per doc 4,6,8 → Nu = 18, Nb = 3+5+7 = 15
    // "new york": c_ab=3, c_new=3, c_york=3
    val nyExpect = math.log((3.0 / 15.0) / ((3.0 / 18.0) * (3.0 / 18.0)))
    val (nP, nA, nB, pmi) = out("new york")
    assert((nP, nA, nB) === ((3L, 3L, 3L)))
    assert(math.abs(pmi - nyExpect) < 1e-6)
    // "of the": c_ab=3, c_of=3, c_the=3 — same counts here, but the
    // min-count gate admits exactly the two 3× bigrams and no others
    assert(out.keySet === Set("new york", "of the"))
  }

  test("gluePhrases rewrites greedily, runs glue at odd positions only") {
    val phrases = Seq(("new", "york"), ("york", "city"), ("a", "a"))
      .toDF("a", "b")
    val docs = Seq(
      (1L, "visit new york city today"), // greedy: new_york glues, york city cannot
      (2L, "a a a a a"),                 // run of 4 matches → positions 0,2 glue
      (3L, "nothing matches here"),
      (4L, "")                           // empty doc survives as empty
    ).toDF("doc_id", "text")
    val out = Pmi.gluePhrases(docs, "doc_id", "text", phrases)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L) === (("visit new_york city today", 1L)))
    assert(out(2L) === (("a_a a_a a", 2L)))
    assert(out(3L) === (("nothing matches here", 0L)))
    assert(out(4L) === (("", 0L)))
  }

  test("bigram totals count per-document adjacency, not cross-doc") {
    // "a b" appears once per doc; "b | a" boundary must not pair
    val docs = Seq("a b", "a b", "a b").toDF("text")
    val out = Pmi.phrases(docs, "text", minCount = 3).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a b"))
    // Nu = 6, Nb = 3, c_ab = 3, c_a = c_b = 3 → ln((3/3)/((3/6)^2)) = ln 4
    assert(math.abs(out.head.getDouble(4) - math.log(4.0)) < 1e-6)
  }
}
