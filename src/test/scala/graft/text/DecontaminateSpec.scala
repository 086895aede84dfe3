package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    // shares the benchmark prompt verbatim mid-document
    (1L, "intro words here the quick brown fox jumps over the lazy dog trailing text"),
    // shares 4 of the prompt's 5 tokens but never 5 in a row
    (2L, "quick brown fox jumps high above the lazy dog"),
    // disjoint vocabulary
    (3L, "completely unrelated content about spark physical plans"),
    // shorter than n tokens: zero grams, must still be reported
    (4L, "too short")
  ).toDF("doc_id", "text")

  private val bench = Seq(
    "the quick brown fox jumps",
    "over the lazy dog entirely"
  ).toDF("bench_text")

  private lazy val out = Decontaminate
    .audit(corpus, "doc_id", "text", bench, "bench_text", n = 5)
    .as[(Long, Long, Long, Int)].collect()
    .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("a verbatim benchmark span flags the doc; near-miss does not") {
    assert(out(1L)._3 === 1)
    // exactly ONE bench gram occurs in doc 1: 'the quick brown fox
    // jumps'; the second prompt's only gram ends in 'entirely', which
    // doc 1's '…lazy dog trailing…' does not contain
    assert(out(1L)._2 === 1)
    assert(out(2L) === ((5L, 0L, 0)), "4-token overlap must NOT flag")
    assert(out(3L)._3 === 0)
  }

  test("docs shorter than n report 0 grams, 0 hits, present exactly once") {
    assert(out(4L) === ((0L, 0L, 0)))
    assert(out.size === 4)
  }

  test("every planted benchmark-source doc is flagged at sf0.001") {
    // the query cuts each bench prompt from docs with hash%16=5; any
    // such doc with ≥8 tokens contains its own slice verbatim
    val res = graft.queries.PipelineQueries.qDecontam(spark, sf)
    val docs = graft.Tables.documents(spark, sf)
    val planted = docs
      .filter(TextAnalysis.hash60(col("doc_id").cast("string")) % 16 === 5)
      .filter(TextAnalysis.tokenCount(col("text")) >= 8)
      .select(col("doc_id"))
    val missed = planted.join(res.filter(col("contaminated") === 0),
      Seq("doc_id"))
    assert(missed.count() === 0,
      "a doc whose own slice IS a benchmark prompt must be flagged")
    assert(planted.count() > 0, "fixture must actually plant contamination")
  }
}
