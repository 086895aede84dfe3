package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** wordNgrams construction edges and the diversity signal itself: a
  * template farm keeps a healthy unigram TTR while its bigram/trigram
  * diversity collapses relative to varied text.
  */
class DiversitySpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams: exact grams, short-text edges, whitespace folding") {
    val df = Seq("a b c d", "a b", "a", "", "  x   y  ").toDF("text")
    val got = df.select(
        TextAnalysis.wordNgrams(col("text"), 3).as("g3"),
        TextAnalysis.wordNgrams(col("text"), 2).as("g2"))
      .collect()
      .map(r => (r.getSeq[String](0).toList, r.getSeq[String](1).toList))
    assert(got(0) === (List("a b c", "b c d"), List("a b", "b c", "c d")))
    assert(got(1) === (Nil, List("a b")))
    assert(got(2) === (Nil, Nil))
    assert(got(3) === (Nil, Nil))
    assert(got(4) === (Nil, List("x y")))
  }

  test("template farm collapses bigram diversity but not unigram TTR") {
    // template: same 6-token frame, one slot varies → unigram types
    // grow with the slot, bigram types are nearly fixed
    val template = (0 until 40).map(i =>
      (i.toLong, "tpl", s"call now to claim prize$i today"))
    val varied = (0 until 40).map(i =>
      (100L + i, "var", s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
    val docs = (template ++ varied).toDF("doc_id", "source", "text")
    def ttr(src: String, n: Int): Double = {
      val g = docs.filter(col("source") === src)
        .select(explode(TextAnalysis.wordNgrams(col("text"), n)).as("g"))
      g.agg((countDistinct(col("g")).cast("double") /
        count(lit(1)).cast("double")).as("t")).collect().head.getDouble(0)
    }
    assert(ttr("var", 2) > 0.99)
    assert(ttr("tpl", 2) < 0.5, "template bigrams should collapse")
    // exact pins from the construction: 40 docs × 6 tokens; unigram
    // types = 5 frame words + 40 slot words = 45/240; bigram types =
    // 3 fixed frame bigrams + 2 slot bigrams per doc = 83/200
    assert(ttr("tpl", 1) === 45.0 / 240.0)
    assert(ttr("tpl", 2) === 83.0 / 200.0)
  }
}
