package graft.ops

import graft.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("non-overlapping chunks reconstruct the token stream exactly") {
    val chunks = Chunking.chunkByTokens(docs, "doc_id", "text", 16, overlap = 0)
    val rebuilt = chunks
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ", array_sort(collect_list(
        struct(col("chunk_idx"), col("chunk_text")))).getField("chunk_text"))
        .as("rebuilt"))
    val orig = docs.select(col("doc_id"),
      array_join(TextAnalysis.tokens(col("text")), " ").as("orig"))
    val bad = orig.join(rebuilt, Seq("doc_id"), "left")
      .filter(not(col("orig") <=> coalesce(col("rebuilt"), lit(""))))
    assert(bad.count() === 0)
  }

  test("overlapping chunks: spans tile the stream with the declared overlap") {
    val c = 16
    val ov = 4
    val stride = c - ov
    val chunks = Chunking.chunkByTokens(docs, "doc_id", "text", c, overlap = ov)
      .withColumn("start", col("chunk_idx") * stride)
    // every chunk is full-size except the last of its document; the
    // last chunk ends exactly at the token count
    val withN = chunks.join(
      docs.select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n")),
      Seq("doc_id"))
    val bad = withN.filter(
      (col("start") + col("n_tokens") > col("n")) ||           // overruns
      (col("n_tokens") < c && col("start") + col("n_tokens") =!= col("n")) ||
      col("n_tokens") <= 0)
    assert(bad.count() === 0)
    // consecutive chunks overlap by exactly `ov` tokens (except where
    // the last chunk is shorter than the overlap, impossible here since
    // stride > 0 means the last chunk holds > ov tokens iff n > ov)
    val cover = withN.groupBy(col("doc_id"), col("n"))
      .agg(max(col("start") + col("n_tokens")).as("covered"),
        count(lit(1)).as("n_chunks"))
      .filter(col("n") > 0)
    assert(cover.filter(col("covered") =!= col("n")).count() === 0)
  }

  test("degenerate documents: empty, whitespace, short") {
    val edge = Seq((1L, ""), (2L, "   \t  "), (3L, "one"),
      (4L, null.asInstanceOf[String]),
      (5L, (1 to 16).map(i => s"t$i").mkString(" ")),
      (6L, (1 to 17).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(edge, "doc_id", "text", 16, overlap = 4)
      .groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!out.contains(1L) && !out.contains(2L) && !out.contains(4L))
    assert(out(3L) === 1L) // one short chunk
    assert(out(5L) === 1L) // exactly one full window, no redundant tail
    assert(out(6L) === 2L) // one token past the window needs a second chunk
  }
}
