package graft.functions

import graft.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** The lang-id / quality-score kernels must be BIT-IDENTICAL to the
  * composed-builtin forms they replace (same tokenizer, same argmax
  * tie-break, same HALF_UP double rounding) — evaluated side by side
  * on crafted edge cases and the real corpus.
  */
class TextFeaturesSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "", "one", "el la de que los aqui",
    "der die und das ist hier",
    "le les des est une chose",
    "的 是 了 在 我 something",
    "the el the el",                 // en/es tie → first wins (en)
    "no markers at all here",        // und
    "  leading and  trailing   whitespace  ",
    "numbers 123 456 and punct !!! ??? ###",
    "unicode: caffè 中文 emoji éè",
    "1234567890", "!!!!", "    "
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("LangIdExpr equals the composed CASE chain") {
    val df = texts.toDF("id", "text")
    val diff = df.select(
      TextAnalysis.langId($"text").as("k"),
      TextAnalysis.langIdComposed($"text").as("b"))
      .filter(not($"k" <=> $"b"))
    assert(diff.count() === 0)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val diff2 = docs.select(
      TextAnalysis.langId($"text").as("k"),
      TextAnalysis.langIdComposed($"text").as("b"))
      .filter(not($"k" <=> $"b"))
    assert(diff2.count() === 0)
  }

  test("QualityScoreExpr equals the composed form bit-for-bit") {
    val df = texts.toDF("id", "text")
    val diff = df.select(
      TextAnalysis.qualityScore($"text").as("k"),
      TextAnalysis.qualityScoreComposed($"text").as("b"))
      .filter(not($"k" <=> $"b"))
    assert(diff.count() === 0)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val diff2 = docs.select(
      TextAnalysis.qualityScore($"text").as("k"),
      TextAnalysis.qualityScoreComposed($"text").as("b"))
      .filter(not($"k" <=> $"b"))
    assert(diff2.count() === 0)
  }

  test("kernels handle null text") {
    val df = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    val r = df.select(
      TextAnalysis.langId($"text").as("l"),
      TextAnalysis.qualityScore($"text").as("q")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
