package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphStoreSpec extends SparkSpec {
  import spark.implicits._

  private def sym(e: Seq[(Long, Long)]) =
    (e ++ e.map(_.swap)).toDF("src", "dst")

  private def edges = sym((0L until 400L).map(i => (i % 80, (i * 13 + 7) % 80))
    .filter { case (a, b) => a != b })

  test("persisted BFS ≡ in-query BFS bit-for-bit") {
    val table = "graph_store_spec"
    try {
      GraphStore.ensureEdges(edges, table, 4)
      val seeds = Seq(0L, 17L).toDF("id")
      val served = GraphStore.bfs(spark, table, seeds, rounds = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val direct = Bfs.run(seeds, edges, rounds = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(served === direct)
      assert(served.nonEmpty)
      graft.CacheRegistry.releaseAll()
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("relaxation join never exchanges the persisted edge side") {
    val table = "graph_store_plan"
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      GraphStore.ensureEdges(edges, table, 4)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // one relaxation round's join shape, exactly as Bfs builds it
      val e = spark.table(table)
      val dist = Seq((0L, 0L)).toDF("id", "dist")
        .repartition(4, $"id")
      val round = e.join(dist, e("src") === dist("id"))
        .select($"dst".as("id"), ($"dist" + 1L).as("dist"))
        .groupBy($"id").agg(min($"dist").as("dist"))
      val plan = round.queryExecution.executedPlan
      def isEdgeScan(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths.exists(
                _.toString.contains(table)) => f
        }.nonEmpty
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if isEdgeScan(j) => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
            if isEdgeScan(j) => j
      }
      assert(joins.nonEmpty, s"no join over the edge scan:\n$plan")
      joins.last.children.filter(isEdgeScan).foreach { side =>
        val ex = side.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
        assert(ex.isEmpty, s"edge side of the join got exchanged:\n$plan")
      }
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("ensureEdges reuses on identical edges, rebuilds on drift") {
    val table = "graph_store_reuse"
    try {
      assert(GraphStore.ensureEdges(edges, table, 2))
      assert(!GraphStore.ensureEdges(edges, table, 2))
      // adding one parallel edge changes the multiset fingerprint
      assert(GraphStore.ensureEdges(
        edges.unionAll(Seq((0L, 1L)).toDF("src", "dst")), table, 2))
      graft.CacheRegistry.releaseAll()
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("ensureEdgesFor: source-fingerprinted reuse never derives the projection") {
    val table = "graph_store_src_fp"
    try {
      val source = (0L until 200L).map(i => (i % 40, (i % 7).toString))
        .toDF("k", "v")
      // first ensure builds from the (by-name) edge thunk
      assert(GraphStore.ensureEdgesFor(source, "k", "v", table, 2)(edges))
      val stored = spark.table(table).orderBy("src", "dst")
        .collect().map(_.toSeq).toSeq
      assert(stored === edges.orderBy("src", "dst")
        .collect().map(_.toSeq).toSeq)
      // unchanged source → reuse, and the build thunk MUST NOT run —
      // that thunk is the projection join the variant exists to skip
      assert(!GraphStore.ensureEdgesFor(source, "k", "v", table, 2)(
        sys.error("projection must not be derived on reuse")))
      // changed source content → rebuild even though the key set is
      // identical (content-level staleness, the IncrementalDedup law)
      val drifted = source.withColumn("v", concat($"v", lit("x")))
      assert(GraphStore.ensureEdgesFor(drifted, "k", "v", table, 2)(edges))
      graft.CacheRegistry.releaseAll()
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
