package graft

import org.apache.spark.sql.functions._

class BenchMetricsSpec extends SparkSpec {

  test("epoch parsing: queries map extracted, junk shapes yield empty") {
    val json = """{"metric":"total","value":89.04,"unit":"sec",
      |"queries":{"q_a":1.5,"q_b":0.25,"q_c":12.0},
      |"runs_per_query":2,"host":{"per_query":{"q_a":{"load_pre":0.1}}}}"""
      .stripMargin.replace("\n", "")
    val m = BenchMetrics.parseEpochQueries(json)
    assert(m === Map("q_a" -> 1.5, "q_b" -> 0.25, "q_c" -> 12.0))
    // the nested per_query object must not leak into the epoch map
    assert(!m.contains("load_pre"))
    assert(BenchMetrics.parseEpochQueries("") === Map.empty)
    assert(BenchMetrics.parseEpochQueries("{\"value\":1}") === Map.empty)
    assert(BenchMetrics.parseEpochQueries("not json at all") === Map.empty)
  }

  test("outlier gate: >2x epoch flagged, new and fast queries skipped") {
    val epoch = Map("q_a" -> 1.0, "q_b" -> 2.0, "q_z" -> 0.0)
    val measured = Seq(
      "q_a" -> 2.5,  // 2.5x -> outlier
      "q_b" -> 3.9,  // 1.95x -> under the line
      "q_new" -> 50.0, // no epoch entry -> skipped
      "q_z" -> 1.0)  // zero epoch entry -> skipped (no meaningful ratio)
    val out = BenchMetrics.outliers(measured, epoch)
    assert(out === Seq(("q_a", 2.5, 1.0, 2.5)))
    // boundary is strict: exactly 2x is not an outlier
    assert(BenchMetrics.outliers(Seq("q_a" -> 2.0), epoch).isEmpty)
    assert(BenchMetrics.outliers(measured, Map.empty).isEmpty)
  }

  test("host-ref parsing: canary fields with/without whitespace, absent io") {
    val epoch = """{"value":1,"host":{"canary_median_sec":0.4351,
      |"canary_fresh_sec":0.3287,"io_canary_median_sec":0.2147}}"""
      .stripMargin.replace("\n", "")
    assert(BenchMetrics.parseHostRef(epoch) ===
      (Some(0.4351), Some(0.3287), Some(0.2147)))
    // pretty-printed anchor (space after colon) and pre-r13 artifact
    // (no io field) both parse
    val anchor = """{"epoch": "r12", "canary_median_sec": 0.4351,
      |"canary_fresh_sec": 0.3287}""".stripMargin.replace("\n", "")
    assert(BenchMetrics.parseHostRef(anchor) ===
      (Some(0.4351), Some(0.3287), None))
    assert(BenchMetrics.parseHostRef("") === (None, None, None))
  }

  test("epoch per-query metric maps parsed for outlier adjudication") {
    val json = """{"queries":{"q_a":1.5},"host":{"per_query":{
      |"q_a":{"sec":1.5,"shuffle_read":952,"input":11786,"tasks":8,
      |"run_ms":654,"gc_ms":0},
      |"q_b":{"sec":0.2,"shuffle_read":0,"input":100,"tasks":2,
      |"run_ms":50,"gc_ms":5}}}}""".stripMargin.replace("\n", "")
    val m = BenchMetrics.parseEpochPerQuery(json)
    assert(m.keySet === Set("q_a", "q_b"))
    assert(m("q_a")("shuffle_read") === 952.0)
    assert(m("q_b")("gc_ms") === 5.0)
    assert(BenchMetrics.parseEpochPerQuery("{}") === Map.empty)
  }

  test("outlier attribution classifies work-changed vs contention vs JVM") {
    def counters(in: Long, sr: Long, t: Long, run: Long, gc: Long,
        cpu: Long = 0L) = {
      val c = new BenchMetrics.Counters
      c.input = in; c.shuffleRead = sr; c.tasks = t
      c.runMs = run; c.cpuMs = cpu; c.gcMs = gc; c
    }
    val epochM = Map("input" -> 1000.0, "shuffle_read" -> 500.0,
      "shuffle_write" -> 0.0, "tasks" -> 8.0)
    // pre-run_ms epoch, same bytes, low gc -> external contention, but
    // HONESTLY marked unverified (no run-vs-wall reference)
    val ext = BenchMetrics.attributeOutlier(
      counters(1000, 500, 8, 1000, 10), epochM, 7.3)
    assert(ext.contains("external contention"), ext)
    assert(ext.contains("UNVERIFIED"), ext)
    // same bytes, gc-dominated -> JVM state
    val jvm = BenchMetrics.attributeOutlier(
      counters(1000, 500, 8, 1000, 400), epochM, 12.3)
    assert(jvm.contains("JVM state"), jvm)
    // input blown up -> code/plan
    val code = BenchMetrics.attributeOutlier(
      counters(5000, 500, 8, 1000, 0), epochM, 3.0)
    assert(code.contains("code/plan"), code)
    // no reference -> honest unattributed
    val none = BenchMetrics.attributeOutlier(
      counters(1, 1, 1, 1, 0), Map.empty, 2.5)
    assert(none.contains("unattributed"), none)
  }

  test("run-vs-wall and cpu-vs-run discriminate the work-unchanged causes") {
    def counters(run: Long, cpu: Long, gc: Long) = {
      val c = new BenchMetrics.Counters
      c.input = 1000; c.shuffleRead = 500; c.tasks = 8
      c.runMs = run; c.cpuMs = cpu; c.gcMs = gc; c
    }
    val epochM = Map("input" -> 1000.0, "shuffle_read" -> 500.0,
      "tasks" -> 8.0, "run_ms" -> 1000.0, "cpu_ms" -> 800.0)
    // wall 10x but task run time flat -> starved between tasks: the
    // one evidenced external-contention signature
    val starved = BenchMetrics.attributeOutlier(
      counters(run = 1100, cpu = 850, gc = 10), epochM, 10.0)
    assert(starved.contains("starved between tasks"), starved)
    // run tracks wall, cpu flat -> off-CPU stall mid-task
    val ioStall = BenchMetrics.attributeOutlier(
      counters(run = 9000, cpu = 900, gc = 10), epochM, 10.0)
    assert(ioStall.contains("off-CPU"), ioStall)
    // cpu tracks wall, gc-dominated -> JVM heap
    val heap = BenchMetrics.attributeOutlier(
      counters(run = 9000, cpu = 7500, gc = 3000), epochM, 10.0)
    assert(heap.contains("JVM heap state"), heap)
    // cpu tracks wall, gc low -> on-CPU slowdown
    val onCpu = BenchMetrics.attributeOutlier(
      counters(run = 9000, cpu = 7500, gc = 10), epochM, 10.0)
    assert(onCpu.contains("on-CPU slowdown"), onCpu)
    // the gc share prints as a NUMBER, never an adjective
    assert(!onCpu.contains("gc low") && onCpu.contains("gc_share"), onCpu)
  }

  test("retry canary cross-check: fast canary + repeated slow retry => contradiction") {
    def counters() = {
      val c = new BenchMetrics.Counters
      c.input = 1000; c.shuffleRead = 500; c.tasks = 8
      c.runMs = 1100; c.cpuMs = 850; c.gcMs = 10; c
    }
    val epochM = Map("input" -> 1000.0, "shuffle_read" -> 500.0,
      "tasks" -> 8.0, "run_ms" -> 1000.0, "cpu_ms" -> 800.0)
    // the r13 q_allpairs shape: 32.8x first, 58.2x retry, canary 0.575
    val contra = BenchMetrics.attributeOutlier(counters(), epochM, 32.8,
      retryRatio = Some(58.2), retryCanaryRatio = Some(0.575))
    assert(contra.contains("CONTRADICTION"), contra)
    assert(contra.contains("NOT supported"), contra)
    // retry back on epoch -> first sample self-labels transient
    val transient = BenchMetrics.attributeOutlier(counters(), epochM, 3.0,
      retryRatio = Some(1.1), retryCanaryRatio = Some(1.0))
    assert(transient.contains("transient"), transient)
    assert(!transient.contains("CONTRADICTION"), transient)
    // slow retry under a SLOW canary: contention reading is consistent,
    // no contradiction stamp
    val consistent = BenchMetrics.attributeOutlier(counters(), epochM, 3.0,
      retryRatio = Some(2.8), retryCanaryRatio = Some(2.1))
    assert(!consistent.contains("CONTRADICTION"), consistent)
    // a code/plan verdict never gets the contradiction stamp (the work
    // counters already explain the time)
    val code = {
      val c = counters(); c.input = 9000
      BenchMetrics.attributeOutlier(c, epochM, 32.8,
        retryRatio = Some(58.2), retryCanaryRatio = Some(0.575))
    }
    assert(code.contains("code/plan") && !code.contains("CONTRADICTION"), code)
  }

  test("listener attributes shuffle bytes to the query's job group") {
    val m = new BenchMetrics.Listener
    spark.sparkContext.addSparkListener(m)
    try {
      spark.sparkContext.setJobGroup("graft.bench:qx#1", "qx")
      spark.range(0, 100000, 1, 4)
        .selectExpr("id % 97 AS k", "id AS v")
        .groupBy(col("k")).agg(sum(col("v"))).count()
      spark.sparkContext.clearJobGroup()
      // ungrouped work must NOT land on qx
      spark.range(0, 1000).count()
      // listener delivery is async — poll briefly instead of sleeping a
      // fixed beat (the production path drains 500 ms once per suite)
      val deadline = System.nanoTime() + 10e9.toLong
      var c = m.forQuery("qx")
      while (c.shuffleWrite == 0 && System.nanoTime() < deadline) {
        Thread.sleep(50); c = m.forQuery("qx")
      }
      assert(c.tasks > 0)
      assert(c.shuffleWrite > 0, "groupBy must have written shuffle bytes")
      assert(c.shuffleRead > 0, "agg side must have read shuffle bytes")
      assert(m.forQuery("no_such_query").tasks === 0)
    } finally spark.sparkContext.removeSparkListener(m)
  }
}
