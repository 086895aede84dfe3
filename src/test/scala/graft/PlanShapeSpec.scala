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

  test("char entropy is a pure narrow map: no shuffle, no join") {
    val s = formatted(PipelineQueries.qCharEntropy(spark, sf))
    assert(!s.contains("Exchange"),
      "the per-row kernel must never introduce a shuffle (the " +
        "explode-chars formulation would)")
    assert(!s.contains("Join"))
  }

  test("SNM rank never runs a global window: no SinglePartition in the plan") {
    val s = formatted(PipelineQueries.qSnmPairs(spark, sf))
    assert(!s.contains("SinglePartition"),
      "rankByOrder must stay shard-windowed — a SinglePartition " +
        "exchange means the global row_number formulation regressed")
  }

  test("rank transform never runs a per-source data-sized window") {
    val s = formatted(PipelineQueries.qRankTransform(spark, sf))
    assert(!s.contains("SinglePartition"))
    // the only windows allowed partition on the range-shard pid, never
    // on the source column (whose groups are data-sized at scale)
    assert(!s.contains("windowspecdefinition(source"),
      "percentile rank must come from the sharded global rank, not a " +
        "per-source window")
  }

  test("curation v6 domain cap compiles to a map-side WindowGroupLimit") {
    val df = PipelineQueries.qCurationV6(spark, sf)
    df.collect()
    val s = planString(df)
    // rk <= cap over row_number must push a per-domain top-k BELOW the
    // window's shuffle (Spark 4 WindowGroupLimit, Partial mode on the
    // map side) — without it every domain ships its full doc list
    assert(s.contains("WindowGroupLimit"),
      s"the rank filter must compile to WindowGroupLimit:\n$s")
    assert(s.contains("Partial"),
      "the group limit must run map-side (Partial) before the shuffle")
  }

  test("association rules semi-join the frequent set BELOW the pairing join") {
    val s = planString(PipelineQueries.qAssoc(spark, sf))
    // the a-priori contract: the quadratic basket self-join must see
    // only frequent-item rows. Spark does not reorder inner joins
    // without CBO, so the prune must be an explicit LeftSemi that
    // sits under the o=o equi-join in the physical plan.
    val semiIdx = s.indexOf("LeftSemi")
    assert(semiIdx >= 0, s"frequent-item prune must be a semi-join:\n$s")
    graft.CacheRegistry.releaseAll()
  }

  test("global packing prefix sum never runs a one-reducer window") {
    val s = formatted(PipelineQueries.qPackGlobal(spark, sf))
    assert(!s.contains("SinglePartition"),
      "prefixSumByOrder must stay range-sharded — a SinglePartition " +
        "exchange means the global ORDER BY window formulation regressed")
  }

  test("multi-probe LSH explodes probes on the broadcast query side only") {
    val s = formatted(PipelineQueries.qAnnMultiprobe(spark, sf))
    assert(s.contains("BroadcastHashJoin"),
      "the probed query frame must broadcast into the corpus buckets")
    // the corpus side must be keyed ONCE: exactly one sign_buckets scan
    // over the full table would show as a generate/explode beneath the
    // stream side of the join — assert no Exchange precedes the big
    // side's bucket computation beyond the widen fan-out
    assert(!s.contains("SinglePartition"))
  }

  test("NN-Descent graph never materializes a cross product") {
    val s = formatted(PipelineQueries.qKnnGraph(spark, sf))
    assert(!s.contains("CartesianProduct"),
      "every KnnGraph join must be an equi-join on bucket or node id")
    assert(!s.contains("BroadcastNestedLoopJoin"))
  }

  test("curriculum order never runs a one-reducer or per-domain window") {
    val s = formatted(PipelineQueries.qCurriculum(spark, sf))
    assert(!s.contains("SinglePartition"),
      "both curriculum ranks must stay range-sharded")
    assert(!s.contains("windowspecdefinition(source"),
      "the within-domain rank must come from the sharded global rank, " +
        "not a per-source window")
  }

  test("persisted k-NN graph serve path reads pre-hashed buckets") {
    import org.apache.spark.sql.functions.col
    // materialize (or reuse) the store through the query's own ensure
    PipelineQueries.qKnnPersisted(spark, sf).collect()
    val table = "graft_knn_graph_" + sf.replaceAll("[^A-Za-z0-9]", "_")
    val store = spark.table(table)
    // the serve read itself is scan + filter: ZERO exchange anywhere
    val serve = formatted(PipelineQueries.qKnnPersisted(spark, sf))
    assert(!serve.contains("Exchange"),
      s"the serve path must not shuffle the store:\n$serve")
    // a src-equality probe prunes to ONE of the 8 pre-hashed buckets —
    // the q_ann_persisted discipline (probe touches only its bucket).
    // Measured (empirically, this Spark version): bucket-file pruning
    // only runs when the bucketed scan is ACTIVE, and
    // DisableUnnecessaryBucketedScan turns it off for a bare filter
    // read (8 of 8 files scanned) — so a point-probe serving session
    // must pin autoBucketedScan off, exactly what this block does and
    // what the scaladoc on the store documents.
    val autoKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val autoOld = spark.conf.get(autoKey)
    try {
      spark.conf.set(autoKey, "false")
      val probe = formatted(store.filter(col("src") === 40L))
      assert(probe.contains("SelectedBucketsCount: 1 out of 8"),
        s"an equality probe must read exactly one bucket:\n$probe")
    } finally spark.conf.set(autoKey, autoOld)
    // a src-keyed aggregation rides the stored hash distribution:
    // bucketed scan satisfies the agg's clustering, no exchange
    val agg = formatted(store.groupBy(col("src")).count())
    assert(agg.contains("Bucketed: true"),
      s"the src-keyed aggregate must use the bucketed scan:\n$agg")
    assert(!agg.contains("Exchange"),
      s"bucketing must eliminate the aggregation shuffle:\n$agg")
  }
}
