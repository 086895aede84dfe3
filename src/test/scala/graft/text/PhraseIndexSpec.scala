package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PhraseIndexSpec extends SparkSpec {
  import spark.implicits._

  test("persisted phrase probe ≡ in-query batch scan bit-for-bit") {
    val table = "phrase_spec_idx"
    try {
      val docs = Tables.documents(spark, sf)
      PhraseIndex.ensure(docs, "doc_id", "text", table, 8)
      val top = PhraseIndex.topBigram(spark, table).collect().head
      val served = PhraseIndex.phraseOccurrences(spark, table,
          top.getString(0), top.getString(1))
        .orderBy("doc_id").collect().toSeq
      val direct = graft.queries.PipelineQueries.qPhraseSearch(spark, sf)
        .orderBy("doc_id").collect().toSeq
      assert(served === direct)
      assert(served.nonEmpty, "the top bigram must occur somewhere")
      graft.CacheRegistry.releaseAll()
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("phrase probe prunes to the queried terms' buckets") {
    val table = "phrase_spec_prune"
    try {
      val docs = Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
        .toDF("doc_id", "text")
      PhraseIndex.ensure(docs, "doc_id", "text", table, 4)
      val df = PhraseIndex.phraseOccurrences(spark, table, "beta", "gamma")
      val s = df.queryExecution.executedPlan.toString
      // FileSourceScanExec reports "SelectedBucketsCount: n out of 4"
      // when the tok filter pruned buckets
      assert(s.contains("SelectedBucketsCount"),
        s"bucket pruning must be active on the postings scan:\n$s")
      assert(df.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("ensure reuses on identical corpus, rebuilds on text drift") {
    val table = "phrase_spec_reuse"
    try {
      val docs = Seq((1L, "alpha beta"), (2L, "beta gamma"))
        .toDF("doc_id", "text")
      assert(PhraseIndex.ensure(docs, "doc_id", "text", table, 2))
      assert(!PhraseIndex.ensure(docs, "doc_id", "text", table, 2))
      val edited = docs.withColumn("text",
        when($"doc_id" === 2L, lit("beta epsilon")).otherwise($"text"))
      assert(PhraseIndex.ensure(edited, "doc_id", "text", table, 2))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
