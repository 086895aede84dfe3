package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  private def queries = Seq(
    ("q1", "alpha quick brown"), ("q2", "data spark shuffle"))
    .toDF("query_id", "qtext")

  test("persisted probe ≡ in-query Bm25.topK bit-for-bit") {
    val table = "bm25_spec_idx"
    try {
      val docs = Tables.documents(spark, sf)
      Bm25Index.ensure(docs, "doc_id", "text", table, 8)
      val served = Bm25Index.topK(spark, table, queries, "doc_id", k = 10)
        .orderBy("query_id", "rank").collect().toSeq
      val direct = Bm25.topK(docs, "doc_id", "text", queries, k = 10)
        .orderBy("query_id", "rank").collect().toSeq
      assert(served === direct)
      assert(served.nonEmpty, "fixture queries must match something")
      graft.CacheRegistry.releaseAll()
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("ensure reuses on identical corpus, rebuilds on text drift") {
    val table = "bm25_spec_reuse"
    try {
      val docs = Seq((1L, "alpha beta"), (2L, "gamma delta"))
        .toDF("doc_id", "text")
      assert(Bm25Index.ensure(docs, "doc_id", "text", table, 2))
      assert(!Bm25Index.ensure(docs, "doc_id", "text", table, 2))
      val edited = docs.withColumn("text",
        when($"doc_id" === 2L, lit("gamma epsilon")).otherwise($"text"))
      assert(Bm25Index.ensure(edited, "doc_id", "text", table, 2))
      // the rebuilt index serves the NEW vocabulary
      val hit = Bm25Index.topK(spark, table,
        Seq(("q", "epsilon")).toDF("query_id", "qtext"), "doc_id")
        .select($"doc_id").as[Long].collect()
      assert(hit.toSeq === Seq(2L))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("MaxScore-pruned probe ≡ unpruned probe bit-for-bit on real docs") {
    val table = "bm25_spec_maxscore"
    try {
      val docs = Tables.documents(spark, sf)
      Bm25Index.ensure(docs, "doc_id", "text", table, 8)
      val pruned = Bm25Index.topKMaxScore(spark, table, queries, "doc_id",
        k = 10).orderBy("query_id", "rank").collect().toSeq
      val full = Bm25Index.topK(spark, table, queries, "doc_id", k = 10)
        .orderBy("query_id", "rank").collect().toSeq
      assert(pruned === full)
      assert(pruned.nonEmpty)
      graft.CacheRegistry.releaseAll()
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("MaxScore stays exact under score ties and a stop-word term") {
    val table = "bm25_spec_maxscore_ties"
    try {
      // "common" sits in EVERY doc (the stop-word whose postings the
      // prune should keep out of the score shuffle); docs 10-15 are
      // identical so their scores TIE exactly and only the id
      // tie-break orders them; "rare" appears in two docs
      val docs = ((1L to 9L).map(i => (i, s"common filler$i words here")) ++
        (10L to 15L).map(i => (i, "common tied tied text")) ++
        Seq((16L, "common rare gem"), (17L, "rare other thing")))
        .toDF("doc_id", "text")
      Bm25Index.ensure(docs, "doc_id", "text", table, 4)
      val qs = Seq(("q1", "common tied"), ("q2", "rare common"),
        ("q3", "absentword")).toDF("query_id", "qtext")
      for (k <- Seq(1, 3, 5, 20)) {
        val pruned = Bm25Index.topKMaxScore(spark, table, qs, "doc_id", k)
          .orderBy("query_id", "rank").collect().toSeq
        val full = Bm25Index.topK(spark, table, qs, "doc_id", k)
          .orderBy("query_id", "rank").collect().toSeq
        assert(pruned === full, s"k=$k diverged")
        graft.CacheRegistry.releaseAll()
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("MaxScore term bounds aggregate exchange-free on the bucketed postings") {
    val table = "bm25_spec_ms_plan"
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      Bm25Index.ensure(Tables.documents(spark, sf), "doc_id", "text",
        table, 8)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = Bm25Index.topKMaxScore(spark, table, queries, "doc_id", k = 5)
      val plan = df.queryExecution.executedPlan
      import org.apache.spark.sql.execution.aggregate.HashAggregateExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      // the per-(query, term) upper-bound aggregate must ride the
      // postings table's tok-bucketing — its whole subtree (cached
      // probe scan included) carries no shuffle
      val uAggs = plan.collect {
        case h: HashAggregateExec if h.groupingExpressions
          .map(_.name).toSet == Set("query_id", "tok") => h
      }
      assert(uAggs.nonEmpty,
        s"expected the per-(query,term) bound aggregate:\n$plan")
      uAggs.foreach { h =>
        val ex = h.collect { case e: ShuffleExchangeLike => e }
        assert(ex.isEmpty,
          s"the term-bound aggregate got an exchange below it:\n$plan")
      }
      assert(plan.collect {
        case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      }.isEmpty, "no cross products anywhere in the pruned probe")
      graft.CacheRegistry.releaseAll()
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("probe plan: postings reach the term join without an exchange") {
    val table = "bm25_spec_plan"
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      Bm25Index.ensure(Tables.documents(spark, sf), "doc_id", "text",
        table, 8)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = Bm25Index.topK(spark, table, queries, "doc_id", k = 5)
      val plan = df.queryExecution.executedPlan
      def hasPostings(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths.exists(
                _.toString.contains("bm25_spec_plan")) => f
        }.nonEmpty
      assert(hasPostings(plan), plan.toString)
      // the explicit broadcast() wins even with the threshold at -1,
      // so the postings side must never sit under a shuffle exchange
      // on its way into the term join
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if hasPostings(j) => j
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if hasPostings(j) => j
      }
      assert(joins.nonEmpty, s"no join over the postings scan:\n$plan")
      joins.last.children.filter(hasPostings).foreach { side =>
        val ex = side.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
        assert(ex.isEmpty,
          s"postings side of the term join got exchanged:\n$plan")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
