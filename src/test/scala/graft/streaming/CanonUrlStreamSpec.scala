package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class SUrl(doc_id: Long, url: String)

/** Stream ≡ batch law for the canonical-URL frontier gate: across two
  * micro-batches, the admitted set equals the batch
  * canonicalize-group-min rule on the concatenated corpus, recrawl
  * variants drop cross-batch, and distinct pages pass.
  */
class CanonUrlStreamSpec extends SparkSpec {
  import spark.implicits._

  test("canonical-URL dedup stream matches the batch min-id rule") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(
      SUrl(1, "https://web.com/page/3?a=1&b=2"),
      SUrl(2, "https://news.com/story/7"))
    // 3 and 4 are recrawl variants of doc 1's page (cross-batch);
    // 5 is a new page on a seen host
    val b2 = Seq(
      SUrl(3, "HTTPS://WEB.com:443/page/3?b=2&a=1#frag"),
      SUrl(4, "https://www.web.com/page/3/?a=1&b=2&utm_source=x"),
      SUrl(5, "https://web.com/page/4?a=1"))
    val mem = MemoryStream[SUrl]
    val q = EventStreams.canonUrlDedupStream(mem.toDF(), "doc_id", "url")
      .writeStream.outputMode("append")
      .format("memory").queryName("curl_out").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curl_out")
      .select($"canon", $"doc_id").as[(String, Long)].collect().toSet
    val batch = (b1 ++ b2).toDF()
      .withColumn("canon", graft.text.UrlOps.canonicalize(col("url")))
      .groupBy($"canon").agg(min($"doc_id").as("doc_id"))
      .as[(String, Long)].collect().toSet
    assert(streamed === batch)
    assert(streamed.map(_._2) === Set(1L, 2L, 5L))
  }

  test("distinct malformed URLs each pass; identical malformed dedup") {
    implicit val sqlCtx = spark.sqlContext
    val b = Seq(
      SUrl(1, "not-a-url-A"),
      SUrl(2, "not-a-url-B"), // different junk — must NOT be dropped
      SUrl(3, "not-a-url-A")) // exact repeat — must be dropped
    val mem = MemoryStream[SUrl]
    val q = EventStreams.canonUrlDedupStream(mem.toDF(), "doc_id", "url")
      .writeStream.outputMode("append")
      .format("memory").queryName("curl_junk").start()
    mem.addData(b: _*); q.processAllAvailable()
    q.stop()
    val kept = spark.table("curl_junk")
      .select($"doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L))
  }
}
