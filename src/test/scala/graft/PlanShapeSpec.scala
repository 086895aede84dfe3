package graft

import graft.queries.{Inventory, PipelineQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Regression pins on the PHYSICAL plan shapes that carry the 100 TB
  * design: filter/column pushdown must reach the parquet scan, small
  * sides must broadcast, and narrow operators must stay shuffle-free.
  * These are the properties PLANS_r{N}.txt documents — pinned here so
  * a refactor that silently un-pushes a filter or turns a broadcast
  * into a shuffle join fails the suite instead of only showing up in
  * the next round's bench.
  */
class PlanShapeSpec extends SparkSpec {

  private def planString(df: DataFrame): String = {
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p: SparkPlan => p.toString
    }
  }

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("q_scan_prune pushes filters and prunes columns at the scan") {
    val s = formatted(Inventory.qScanPrune(spark, sf))
    assert(s.contains("PushedFilters: [IsNotNull"),
      "filters must reach the parquet scan")
    assert(!s.contains("l_extendedprice"),
      "untouched columns must be pruned from ReadSchema")
  }

  test("q_agg_pushdown answers COUNT/MIN/MAX from parquet footer stats") {
    val df = Inventory.qAggPushdown(spark, sf)
    val s = formatted(df)
    assert(s.contains("PushedAggregation: [COUNT(*)"),
      s"aggregates must push to the scan:\n$s")
    // and the isolated newSession leaves THIS session's planner alone
    assert(spark.conf.get("spark.sql.parquet.aggregatePushdown") === "false")
    // values still exact vs a plain row-scan aggregate
    val viaScan = spark.read.parquet(s"$sf/lineitem.parquet")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.min("l_orderkey"),
        org.apache.spark.sql.functions.max("l_orderkey"),
        org.apache.spark.sql.functions.min("l_quantity"),
        org.apache.spark.sql.functions.max("l_quantity")).head()
    assert(df.head() === viaScan)
  }

  test("dimension joins broadcast the small side") {
    val s = formatted(Inventory.qJoinMulti(spark, sf))
    assert(s.contains("BroadcastHashJoin"),
      "nation/region dims must broadcast, not shuffle")
  }

  test("chunking is narrow: no shuffle anywhere in the plan") {
    val s = formatted(PipelineQueries.qChunkSplit(spark, sf))
    assert(!s.contains("Exchange"),
      "token chunking must not introduce a shuffle")
  }

  test("BM25 broadcasts the query-term table into the postings join") {
    val s = formatted(PipelineQueries.qBm25(spark, sf))
    assert(s.contains("BroadcastHashJoin"),
      "query terms must broadcast into tf postings")
  }

  test("k-means assignment stage is join-free (literal centroids)") {
    val emb = Tables.embeddings(spark, sf)
    val m = graft.sim.KMeans.fit(emb, "vec_id", "embedding", k = 4, iters = 1)
    val s = formatted(graft.sim.KMeans.assignWith(emb, "vec_id", "embedding", m))
    assert(!s.contains("Join"), "assignment must not join against centroids")
    // the only allowed Exchange is Parallelism.widen's deliberate
    // round-robin fan-out; a KEYED shuffle would mean the literal
    // centroids regressed to a join/aggregation
    assert(!s.contains("hashpartitioning"),
      "assignment must not shuffle on any key")
  }
}
