package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Vec(vec_id: Long, ts: java.sql.Timestamp, v: Array[Double])

case class SDoc(doc_id: Long, text: String)

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._
  import EventStreams._

  private def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  private def events = Seq(
    Event(1, ts(0), 10, "click", 1.0),
    Event(2, ts(5), 10, "view", 2.0),
    Event(3, ts(90), 10, "click", 3.0),   // >30min gap → new session
    Event(4, ts(2), 20, "purchase", 4.0)
  )

  test("windowed counts: same result on batch input as the streaming transform") {
    val batch = windowedTypeCounts(events.toDF())
    val rows = batch.collect().map(r =>
      (r.getAs[java.sql.Timestamp]("window_start").getTime / 60000 % 1440,
        r.getString(1), r.getLong(2))).toSet
    assert(rows.map(_._2) === Set("click", "view", "purchase"))
    assert(rows.forall(_._3 >= 1))
  }

  test("streaming windowed agg over MemoryStream emits finalized windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = windowedTypeCounts(mem.toDF(), "10 minutes", "5 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    val out = spark.table("win_out").collect()
    q.stop()
    assert(out.length >= 3)
    assert(out.map(_.getAs[Long]("n")).sum === 4)
  }

  test("streaming histograms equal the batch twin; TV-vs-reference finalizes") {
    implicit val sqlCtx = spark.sqlContext
    // epoch-ALIGNED base so minutes 0-9 / 10-19 are exactly two windows
    def tsA(min: Int) = new java.sql.Timestamp(1700000400000L + min * 60000L)
    // two 10-min windows with DIFFERENT value distributions per type
    val data = (0 until 80).map { i =>
      val m = if (i < 40) i % 9 else 10 + i % 8 // windows [0,10) and [10,20)
      val v = if (i < 40) (i % 10).toDouble else 5.0 + (i % 5) // shifted dist
      Event(i.toLong, tsA(m), i.toLong, if (i % 2 == 0) "click" else "view", v)
    }
    val mem = MemoryStream[Event]
    val q = EventStreams.histogramStream(mem.toDF(), lo = 0.0, hi = 10.0,
      bins = 8, window_ = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("hist_out").start()
    mem.addData(data: _*)
    q.processAllAvailable()
    mem.addData(Event(999, tsA(120), 999, "click", 1.0)) // close both windows
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hist_out")
      .collect().map(r => (r.getAs[java.sql.Timestamp](0).getTime,
        r.getString(1), r.getInt(2), r.getLong(3))).toSet
    val batch = graft.ops.Drift.histogram(
      data.toDF().select(window($"ts", "10 minutes").as("w"), $"event_type",
        $"value"),
      Seq("w", "event_type"), "value", 0.0, 10.0, 8)
      .select($"w.start", $"event_type", $"bin", $"cnt")
      .collect().map(r => (r.getAs[java.sql.Timestamp](0).getTime,
        r.getString(1), r.getInt(2), r.getLong(3))).toSet
    assert(streamed === batch)
    // finalize: per-window TV against the first window as reference
    val ref = graft.ops.Drift.histogram(
      data.filter(_.ts.getTime < tsA(10).getTime).toDF(),
      Seq("event_type"), "value", 0.0, 10.0, 8)
    val tv = graft.ops.Drift.driftVsReference(
      spark.table("hist_out"), ref, "event_type")
      .collect().map(r => ((r.getAs[java.sql.Timestamp](0).getTime,
        r.getString(1)), r.getDouble(4))).toMap
    // window 0 vs itself → TV 0; shifted window 1 drifts
    val w0 = tsA(0).getTime; val w1 = tsA(10).getTime
    assert(tv((w0, "click")) === 0.0 && tv((w0, "view")) === 0.0)
    assert(tv((w1, "click")) > 0.2 && tv((w1, "view")) > 0.2)
  }

  test("streaming IVF cell occupancy equals the batch assignment") {
    implicit val sqlCtx = spark.sqlContext
    def tsA(min: Int) = new java.sql.Timestamp(1700000400000L + min * 60000L)
    // 3 planted cluster centers; vectors alternate across two windows
    val data = (0 until 90).map { i =>
      val c = i % 3
      Vec(i.toLong, tsA(if (i < 45) i % 9 else 10 + i % 8),
        Array(c * 10.0 + (i % 5) * 0.1, c * -5.0 + (i % 7) * 0.1))
    }
    val model = graft.sim.KMeans.fit(
      data.toDF(), "vec_id", "v", k = 3, iters = 5)
    val mem = MemoryStream[Vec]
    val q = EventStreams.ivfAssignStream(mem.toDF(), "v", model,
      window_ = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("ivf_out").start()
    mem.addData(data: _*)
    q.processAllAvailable()
    mem.addData(Vec(999, tsA(120), Array(0.0, 0.0)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ivf_out")
      .collect().map(r => (r.getAs[java.sql.Timestamp](0).getTime,
        r.getInt(1), r.getLong(2))).toSet
    val batch = data.toDF()
      .select(window($"ts", "10 minutes").as("w"),
        graft.sim.KMeans.clusterOf($"v", model).as("cluster"))
      .groupBy($"w", $"cluster").agg(count(lit(1)).as("n"))
      .select($"w.start", $"cluster", $"n")
      .collect().map(r => (r.getAs[java.sql.Timestamp](0).getTime,
        r.getInt(1), r.getLong(2))).toSet
    assert(streamed === batch)
    // clusterOf is the SAME assignment as the batch index path
    val viaAssign = graft.sim.KMeans.assignDist(
      data.toDF(), "vec_id", "v", model)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    val viaExpr = data.toDF()
      .select($"vec_id", graft.sim.KMeans.clusterOf($"v", model))
      .as[(Long, Int)].collect().toMap
    assert(viaExpr === viaAssign)
    // 3 planted centers → all 3 cells occupied in each closed window
    assert(streamed.map(_._1).size === 2 &&
      streamed.groupBy(_._1).forall(_._2.size === 3))
  }

  test("streaming HLL registers equal the batch sketch bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    // 40 events, 17 distinct users across two 10-minute windows, plus
    // a late sentinel that pushes the watermark past both windows so
    // append mode finalizes them
    val data = (0 until 40).map { i =>
      Event(i.toLong, ts(i % 18), (i % 17 + 1).toLong, "click", 1.0)
    }
    val sentinel = Event(99, ts(120), 999, "click", 1.0)
    val mem = MemoryStream[Event]
    val q = EventStreams.hllRegistersStream(mem.toDF(),
      window_ = "10 minutes", watermark = "5 minutes", b = 6)
      .writeStream.outputMode("append")
      .format("memory").queryName("hll_out").start()
    mem.addData(data: _*)
    q.processAllAvailable()
    mem.addData(sentinel)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hll_out")
      .collect().map(r => (r.getAs[java.sql.Timestamp](0).getTime,
        r.getLong(1), r.getInt(2))).toSet
    // batch twin over the SAME rows (sentinel's window never closed →
    // absent from the append-mode stream output by design)
    val batch = graft.sketch.Hll.registers(
      data.toDF().select(window($"ts", "10 minutes").as("w"), $"user_id"),
      Seq("w"), "user_id", b = 6)
      .select($"w.start", $"reg_idx", $"reg_rank")
      .collect().map(r => (r.getAs[java.sql.Timestamp](0).getTime,
        r.getLong(1), r.getInt(2))).toSet
    assert(streamed == batch)
    // every closed window present, the sentinel's open window absent
    // (batch ran WITHOUT the sentinel, so equality already proves it;
    // pin the count of epoch-aligned 10-min windows over minutes 0-17)
    assert(streamed.map(_._1).size == 3)
  }

  test("streaming HLL estimates finalize to the batch estimate") {
    implicit val sqlCtx = spark.sqlContext
    val data = (0 until 60).map { i =>
      Event(i.toLong, ts(i % 9), (i % 23 + 1).toLong, "view", 1.0)
    }
    val mem = MemoryStream[Event]
    val q = EventStreams.hllRegistersStream(mem.toDF(),
      window_ = "10 minutes", watermark = "5 minutes", b = 6)
      .writeStream.outputMode("append")
      .format("memory").queryName("hll_est_out").start()
    mem.addData(data: _*)
    q.processAllAvailable()
    mem.addData(Event(99, ts(120), 999, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val est = graft.sketch.Hll.estimateFromRegisters(
      spark.table("hll_est_out").withColumnRenamed("window_start", "w"),
      Seq("w"), b = 6)
      .select($"w".cast("long"), $"n_est", $"zero_regs")
      .as[(Long, Double, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val batchEst = graft.sketch.Hll.estimate(
      data.toDF().select(window($"ts", "10 minutes").as("w"), $"user_id"),
      Seq("w"), "user_id", b = 6)
      .select($"w.start".cast("long"), $"n_est")
      .as[(Long, Double)].collect().toMap
    // identical registers → identical per-window estimates
    assert(est.view.mapValues(_._1).toMap == batchEst)
    // and each corrected estimate lands near the true per-window
    // distinct count (b=6 → σ ≈ 13%)
    // keys in epoch SECONDS: cast(timestamp as long) yields seconds
    val truth = data.groupBy(e => Math.floorDiv(e.ts.getTime, 600000L) * 600L)
      .view.mapValues(_.map(_.user_id).distinct.size).toMap
    est.foreach { case (w, (nEst, zeroRegs)) =>
      val corrected = graft.sketch.Hll.corrected(nEst, zeroRegs, b = 6)
      val t = truth(w).toDouble
      assert(math.abs(corrected - t) / t < 0.35,
        s"window $w: estimate $corrected too far from $t")
    }
  }

  test("SLIDING-window streaming HLL equals the batch sliding twin") {
    implicit val sqlCtx = spark.sqlContext
    def tsA(min: Int) = new java.sql.Timestamp(1700000400000L + min * 60000L)
    val data = (0 until 60).map { i =>
      Event(i.toLong, tsA(i % 18), (i % 13 + 1).toLong, "view", 1.0)
    }
    val mem = MemoryStream[Event]
    val q = EventStreams.hllRegistersStream(mem.toDF(),
      window_ = "10 minutes", watermark = "5 minutes", b = 6,
      slide = Some("5 minutes"))
      .writeStream.outputMode("append")
      .format("memory").queryName("hll_slide_out").start()
    mem.addData(data: _*)
    q.processAllAvailable()
    mem.addData(Event(99, tsA(120), 999, "view", 1.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hll_slide_out")
      .collect().map(r => (r.getAs[java.sql.Timestamp](0).getTime,
        r.getLong(1), r.getInt(2))).toSet
    val batch = graft.sketch.Hll.registers(
      data.toDF().select(
        window($"ts", "10 minutes", "5 minutes").as("w"), $"user_id"),
      Seq("w"), "user_id", b = 6)
      .select($"w.start", $"reg_idx", $"reg_rank")
      .collect().map(r => (r.getAs[java.sql.Timestamp](0).getTime,
        r.getLong(1), r.getInt(2))).toSet
    assert(streamed === batch)
    // minutes 0-17 at a 5-min slide → 5 distinct 10-min windows
    assert(streamed.map(_._1).size === 5)
  }

  test("streaming CMS counters equal the batch sketch and bound true counts") {
    implicit val sqlCtx = spark.sqlContext
    val types = Seq("click", "view", "purchase", "refund")
    val data = (0 until 50).map { i =>
      Event(i.toLong, ts(i % 12), (i % 7).toLong, types(i % types.size), 1.0)
    }
    val mem = MemoryStream[Event]
    val q = EventStreams.cmsCountersStream(mem.toDF(),
      window_ = "10 minutes", watermark = "5 minutes", w = 64)
      .writeStream.outputMode("append")
      .format("memory").queryName("cms_out").start()
    mem.addData(data: _*)
    q.processAllAvailable()
    mem.addData(Event(99, ts(120), 999, "click", 1.0)) // watermark push
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cms_out").collect()
      .map(r => (r.getAs[java.sql.Timestamp](0).getTime, r.getInt(1),
        r.getLong(2), r.getLong(3))).toSet
    val batch = graft.sketch.CountMin.counters(
      data.toDF().select(window($"ts", "10 minutes").as("w"), $"event_type"),
      Seq("w"), "event_type", w = 64)
      .select($"w.start", $"cm_row", $"cm_bucket", $"cnt")
      .collect().map(r => (r.getAs[java.sql.Timestamp](0).getTime,
        r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    // point estimates from the STREAMED counters: one-sided ≥ truth,
    // and exact here (4 keys into w=64 buckets — no collisions)
    val probed = graft.sketch.CountMin.estimate(
      data.toDF().select(window($"ts", "10 minutes").as("w"), $"event_type"),
      types.toDF("event_type"), Seq("w"), "event_type", w = 64)
      .select($"event_type", $"w.start".cast("long"), $"est_count")
      .as[(String, Long, Long)].collect()
    val truth = data.groupBy(e =>
        (e.event_type, Math.floorDiv(e.ts.getTime, 600000L) * 600L))
      .view.mapValues(_.size.toLong).toMap
    probed.foreach { case (tpe, w0, est) =>
      assert(est == truth.getOrElse((tpe, w0), 0L),
        s"($tpe, $w0): est $est vs truth ${truth.get((tpe, w0))}")
    }
  }

  test("streaming windowed top-k equals the batch twin, ranks and ties pinned") {
    implicit val sqlCtx = spark.sqlContext
    // two event types across two 10-minute windows; values collide so
    // the event_id tie-break is exercised; late sentinel closes both
    val data = (0 until 36).map { i =>
      Event(i.toLong, ts(i % 18), i.toLong % 5,
        if (i % 2 == 0) "click" else "view", (i % 7).toDouble / 3.0)
    }
    val sentinel = Event(99, ts(120), 999, "click", 0.0)
    val mem = MemoryStream[Event]
    val q = EventStreams.topKStream(mem.toDF(), k = 3,
      window_ = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("topk_out").start()
    mem.addData(data: _*)
    q.processAllAvailable()
    mem.addData(sentinel)
    q.processAllAvailable()
    q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[java.sql.Timestamp](0).getTime, r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val streamed = canon(spark.table("topk_out"))
    // batch twin: the SAME transform over the same rows (watermark is
    // a no-op on batch; sentinel's window never closed → absent above)
    val batch = canon(EventStreams.topKStream(data.toDF(), k = 3,
      window_ = "10 minutes", watermark = "5 minutes"))
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // every (window, type) emits at most 3 ranks, dense from 1
    streamed.groupBy(t => (t._1, t._2)).foreach { case (_, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1L to rows.size).toSeq)
      assert(rows.size <= 3)
    }
  }

  test("batch sessionization splits on the inactivity gap") {
    val sess = sessionizeBatch(events.toDF())
      .filter($"user_id" === 10).orderBy($"session_start").collect()
    assert(sess.length === 2)
    assert(sess(0).getAs[Long]("n_events") === 2)   // min 0 + 5
    assert(sess(1).getAs[Long]("n_events") === 1)   // min 90
  }

  test("sessionizeBatch default tie-break tolerates a frame without event_id") {
    // default tieCols apply only when the column exists — a frame
    // lacking event_id must still sessionize (round-5 advice: the new
    // default silently broke external callers without that column)
    val noId = events.toDF().drop("event_id")
    val sess = sessionizeBatch(noId)
      .filter($"user_id" === 10).orderBy($"session_start").collect()
    assert(sess.length === 2)
    // an EXPLICIT missing tie column still fails loudly
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      sessionizeBatch(noId, tieCols = Seq("event_id")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("event_id"))
  }

  test("streaming dedup keeps the first document per fingerprint") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val deduped = dedupStream(
      mem.toDF().toDF("doc_id", "ts", "text"), "ts", "text")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    mem.addData(
      (1L, ts(0), "the quick brown fox"),
      (2L, ts(1), "THE  QUICK brown fox"),   // same normalized content
      (3L, ts(2), "something else entirely"),
      (4L, ts(3), "the quick brown fox"))    // exact duplicate
    q.processAllAvailable()
    val out = spark.table("dedup_out").collect()
    q.stop()
    // one survivor per normalized-content fingerprint, first wins
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 3L))
    // streaming result ≡ batch Dedup.exact representative count
    val batchGroups = graft.dedup.Dedup.exact(
      Seq((1L, "the quick brown fox"), (2L, "THE  QUICK brown fox"),
        (3L, "something else entirely"), (4L, "the quick brown fox"))
        .toDF("doc_id", "text"), "doc_id", "text").count()
    assert(out.length.toLong === batchGroups)
  }

  test("streaming decontamination gate ≡ batch audit's clean set") {
    implicit val sqlCtx = spark.sqlContext
    val bench = Seq("the quick brown fox jumps over").toDF("bench_text")
    val mem = MemoryStream[(Long, String)]
    val gated = EventStreams.decontamGateStream(
      mem.toDF().toDF("doc_id", "text"), "text", bench, "bench_text", n = 5)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("decontam_out").start()
    val docs = Seq(
      (1L, "prefix the quick brown fox jumps over something"), // leaks
      (2L, "quick brown fox jumps high above everything"),     // 4-gram only
      (3L, "totally unrelated clean content right here"),
      (4L, "tiny"))                                            // < n tokens
    mem.addData(docs: _*)
    q.processAllAvailable()
    val streamed = spark.table("decontam_out")
      .select($"doc_id").as[Long].collect().toSet
    q.stop()
    assert(streamed === Set(2L, 3L, 4L))
    // bit-for-bit the batch operator's clean set
    val batchClean = graft.text.Decontaminate.audit(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      bench, "bench_text", n = 5)
      .filter($"contaminated" === 0).select($"doc_id")
      .as[Long].collect().toSet
    assert(streamed === batchClean)
  }

  test("streaming blocklist gate ≡ batch gate's kept set") {
    implicit val sqlCtx = spark.sqlContext
    val dict = Seq("slow", "table scan", "password")
    val mem = MemoryStream[(Long, String)]
    val gated = EventStreams.blocklistGateStream(
      mem.toDF().toDF("doc_id", "text"), "text", dict)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("blocklist_out").start()
    val docs = Seq(
      (1L, "a SLOW query crawls"),          // case-folded hit
      (2L, "full table scan on the fact"),  // phrase hit
      (3L, "clean fast content here"),
      (4L, "mypassword123 leaked"),         // substring hit inside a token
      (5L, "perfectly fine row data"))
    mem.addData(docs: _*)
    q.processAllAvailable()
    val streamed = spark.table("blocklist_out")
      .select($"doc_id").as[Long].collect().toSet
    q.stop()
    assert(streamed === Set(3L, 5L))
    // bit-for-bit the batch gate's kept set
    val batchKept = docs.toDF("doc_id", "text")
      .filter(graft.functions.Blocklist.blocklist_hits(
        lower($"text"), dict).getField("hits") === 0)
      .select($"doc_id").as[Long].collect().toSet
    assert(streamed === batchKept)
  }

  test("near-dup gate sink: streamed batches ≡ batch classification, " +
      "idempotent partitions") {
    implicit val sqlCtx = spark.sqlContext
    val table = "stream_near_gate_state"
    val sink = java.nio.file.Files.createTempDirectory("near_gate_sink")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("near_gate_ckpt")
      .toString
    try {
      val corpus = Seq(
        (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
          "lambda mu nu xi omicron pi")).toDF("doc_id", "text")
      graft.dedup.IncrementalDedup.ensureNearState(
        corpus, "doc_id", "text", table, 4)
      val mem = MemoryStream[(Long, String)]
      val q = EventStreams.nearDedupGateSink(
        mem.toDF().toDF("doc_id", "text"), table, "doc_id", "text",
        sink, ckpt)
      val b1 = Seq(
        (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
          "lambda mu nu xi omicron pi extra"),                 // near dup
        (11L, "wholly different fresh content with new words"))
      val b2 = Seq(
        (12L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
          "lambda mu nu xi omicron pi"))                       // verbatim
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      q.stop()
      val out = spark.read.parquet(sink)
        .select($"doc_id", $"status", $"owner_id").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(out(10L) === (("near_dup_of_state", 1L)))
      assert(out(11L)._1 === "kept")
      assert(out(12L) === (("near_dup_of_state", 1L)))
      assert(out.size === 3)
      // bit-for-bit the batch operator on the same rows
      val batchAll = graft.dedup.IncrementalDedup.nearDedupAgainst(
        spark, table, (b1 ++ b2).toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2)))).toMap
      assert(out === batchAll)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("streaming dedup against a static reference drops corpus duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val reference = Seq(
      (100L, "already in the training corpus"),
      (101L, "ALSO  already   IN the training corpus")
    ).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val survivors = dedupAgainstStream(
      mem.toDF().toDF("doc_id", "ts", "text"), reference, "ts", "text")
    val q = survivors.writeStream.outputMode("append")
      .format("memory").queryName("dedup_ref_out").start()
    mem.addData(
      (1L, ts(0), "a genuinely new document"),
      (2L, ts(1), "already in the training corpus"),        // exact corpus dup
      (3L, ts(2), "also already in the training corpus"),   // normalized corpus dup
      (4L, ts(3), "a GENUINELY new document"),              // in-stream normalized dup of 1
      (5L, ts(4), "another new document"))
    q.processAllAvailable()
    val out = spark.table("dedup_ref_out").collect()
    q.stop()
    assert(out.map(_.getAs[Long]("doc_id")).toSet === Set(1L, 5L))
    // equivalence with the batch twin's exact stage: survivors of
    // dropDuplicatesAgainst (which keeps in-batch dups) deduped
    // in-batch = the streaming result
    val incoming = Seq(
      (1L, "a genuinely new document"),
      (2L, "already in the training corpus"),
      (3L, "also already in the training corpus"),
      (4L, "a GENUINELY new document"),
      (5L, "another new document")).toDF("doc_id", "text")
    val batchIds = graft.dedup.Dedup.dropDuplicatesAgainst(
      incoming, reference, "doc_id", "text")
      .groupBy(graft.text.TextAnalysis.fingerprintHex(col("text")))
      .agg(min(col("doc_id")).as("doc_id"))
      .select($"doc_id").as[Long].collect().toSet
    graft.CacheRegistry.releaseAll()
    assert(batchIds === out.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("streaming corpus gate admits the same documents as the batch gate") {
    implicit val sqlCtx = spark.sqlContext
    import graft.text.{TextAnalysis => TA}
    val docs = Seq(
      (1L, ts(0), "the quick brown fox is with the lazy dog and the cat"),
      (2L, ts(1), "el la de que los aqui algo mas"),             // not en
      (3L, ts(2), "!!!! #### $$$$ %%%% ^^^^ &&&&"),              // low quality
      (4L, ts(3), "THE  QUICK brown fox is with the lazy dog and the cat"),
      (5L, ts(4), "the engine is built with care and the tests are with it too"))
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val gated = EventStreams.corpusGateStream(
      mem.toDF().toDF("doc_id", "ts", "text"), "ts", "text")
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("gate_out").start()
    mem.addData(docs: _*)
    q.processAllAvailable()
    val streamIds = spark.table("gate_out")
      .select($"doc_id").as[Long].collect().toSet
    q.stop()
    // batch twin: same gate kernels + exact-dedup representatives
    val batch = docs.toDF("doc_id", "ts", "text")
      .filter(TA.langId($"text") === "en" && TA.qualityScore($"text") >= 0.65)
    val batchIds = graft.dedup.Dedup.exact(batch, "doc_id", "text")
      .select($"keep_id").as[Long].collect().toSet
    assert(streamIds === batchIds)
    assert(!streamIds.contains(2L) && !streamIds.contains(3L)) // gated out
    assert(!streamIds.contains(4L))                            // dup of 1
  }

  test("stream-static enrichment attaches dim attributes per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((10L, "gold"), (20L, "trial")).toDF("user_id", "segment")
    val mem = MemoryStream[Event]
    val q = EventStreams.enrichWithDim(mem.toDF(), dim, Seq("user_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    val out = spark.table("enrich_out")
      .select($"event_id", $"segment").as[(Long, String)].collect().toMap
    q.stop()
    assert(out(1L) === "gold" && out(4L) === "trial")
    // batch twin: identical transform on the batch frame
    val batch = EventStreams.enrichWithDim(events.toDF(), dim, Seq("user_id"))
      .select($"event_id", $"segment").as[(Long, String)].collect().toMap
    assert(out === batch)
  }

  test("stream-stream join within a time bound matches the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq((10L, ts(0)), (10L, ts(40)), (20L, ts(2)))
    val views = Seq((10L, ts(5)), (10L, ts(60)), (30L, ts(3)))
    val memC = MemoryStream[(Long, java.sql.Timestamp)]
    val memV = MemoryStream[(Long, java.sql.Timestamp)]
    def joined(c: org.apache.spark.sql.DataFrame, v: org.apache.spark.sql.DataFrame) =
      EventStreams.joinStreamsWithin(
        c.toDF("c_user", "c_ts"), v.toDF("v_user", "v_ts"),
        "c_user", "v_user", "c_ts", "v_ts", within = "10 minutes")
    val q = joined(memC.toDF(), memV.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    memC.addData(clicks: _*)
    memV.addData(views: _*)
    q.processAllAvailable()
    val stream = spark.table("ssj_out")
      .select($"c_user", $"c_ts", $"v_ts")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime)).toSet
    q.stop()
    // batch twin: withWatermark is a no-op on batch frames
    val batch = joined(clicks.toDF("u", "t"), views.toDF("u", "t"))
      .select($"c_user", $"c_ts", $"v_ts")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime)).toSet
    assert(stream === batch)
    // click@0 ⋈ view@5 only; click@40 matches nothing within ±10min
    assert(stream.map(_._1) === Set(10L))
    assert(stream.size === 1)
  }

  test("stream-stream join state is evicted past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val memC = MemoryStream[(Long, java.sql.Timestamp)]
    val memV = MemoryStream[(Long, java.sql.Timestamp)]
    val q = EventStreams.joinStreamsWithin(
      memC.toDF().toDF("c_user", "c_ts"), memV.toDF().toDF("v_user", "v_ts"),
      "c_user", "v_user", "c_ts", "v_ts",
      within = "10 minutes", watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("evict_out").start()
    try {
      // batch 1: a matching pair at t0/t5, plus sentinels far in the
      // future that push both watermarks to ~t490
      memC.addData((1L, ts(0)), (99L, ts(500)))
      memV.addData((1L, ts(5)), (98L, ts(500)))
      q.processAllAvailable()
      val afterBatch1 = spark.table("evict_out").count()
      assert(afterBatch1 === 1) // t0 ⋈ t5 within ±10min
      // batch 2: a view at t1 would match the t0 click, but the click's
      // buffered state is evictable once the watermark passed t0+10min —
      // the late row must produce nothing
      memV.addData((1L, ts(1)))
      q.processAllAvailable()
      assert(spark.table("evict_out").count() === afterBatch1)
    } finally q.stop()
  }

  test("streaming CDC snapshot equals batch changelog application") {
    implicit val sqlCtx = spark.sqlContext
    val snap = java.nio.file.Files.createTempDirectory("graft-cdc").toString + "/snap"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ckpt").toString
    val mem = MemoryStream[(Long, Long, String, String)]
    val q = EventStreams.startCdcSnapshot(
      mem.toDF().toDF("key", "v", "payload", "op"),
      snap, ckpt, Seq("key"), Seq("v"), col("op") === "d")
    try {
      mem.addData((1L, 1L, "one-v1", "u"), (2L, 1L, "two-v1", "u"))
      q.processAllAvailable()
      mem.addData((1L, 2L, "one-v2", "u"), (2L, 2L, "x", "d"),
        (3L, 1L, "three-v1", "u"))
      q.processAllAvailable()
      // a LATE, out-of-order upsert older than key 2's delete (v=1 < 2)
      // must NOT resurrect the deleted key — the snapshot retains the
      // tombstone version to defend against exactly this
      mem.addData((2L, 1L, "stale-resurrect", "u"))
      q.processAllAvailable()
      val got = EventStreams.readCdcSnapshot(spark, snap)
        .select($"key", $"payload").as[(Long, String)].collect().toSet
      // batch twin over the full concatenated changelog
      val full = Seq((1L, 1L, "one-v1", "u"), (2L, 1L, "two-v1", "u"),
        (1L, 2L, "one-v2", "u"), (2L, 2L, "x", "d"), (3L, 1L, "three-v1", "u"),
        (2L, 1L, "stale-resurrect", "u"))
        .toDF("key", "v", "payload", "op")
      val want = graft.ops.Upsert.applyChangelog(full.limit(0), full,
        Seq("key"), Seq("v"), col("op") === "d")
        .select($"key", $"payload").as[(Long, String)].collect().toSet
      assert(got === want && got === Set((1L, "one-v2"), (3L, "three-v1")))
    } finally q.stop()
  }

  test("CDC snapshot restores the .old backup after a mid-swap crash") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-cdc-crash").toString
    val snap = root + "/snap"
    def feed(ckpt: String, rows: (Long, Long, String, String)*): Unit = {
      val mem = MemoryStream[(Long, Long, String, String)]
      val q = EventStreams.startCdcSnapshot(
        mem.toDF().toDF("key", "v", "payload", "op"),
        snap, ckpt, Seq("key"), Seq("v"), col("op") === "d")
      try { mem.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    }
    feed(root + "/ck1", (1L, 1L, "one", "u"), (2L, 1L, "two", "u"))
    // simulate a crash between stage-out and promote: the snapshot dir
    // is gone, the previous state sits in .old
    val fs = new org.apache.hadoop.fs.Path(snap)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(snap),
      new org.apache.hadoop.fs.Path(snap + ".old")))
    // next batch (fresh query/checkpoint = the replay) must restore the
    // backup first — NOT rebuild from empty and lose keys 1 and 2
    feed(root + "/ck2", (3L, 1L, "three", "u"))
    val got = EventStreams.readCdcSnapshot(spark, snap)
      .select($"key", $"payload").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "one"), (2L, "two"), (3L, "three")))
  }

  test("idempotent foreachBatch sink: replaying a batch does not duplicate") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ckpt").toString
    val mem = MemoryStream[(Long, String)]
    def run(): Unit = {
      val q = EventStreams.startIdempotentSink(
        mem.toDF().toDF("id", "payload"), dir, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    mem.addData((1L, "a"), (2L, "b"))
    run()
    val afterFirst = spark.read.parquet(dir)
      .select($"id", $"payload").as[(Long, String)].collect().toSet
    assert(afterFirst === Set((1L, "a"), (2L, "b")))
    // simulate the batch being replayed (sink failure before commit):
    // write batch 0's data again under the same batch id — the
    // partition overwrite must replace, not append
    graft.sources.ParquetSink.overwritePartitions(
      Seq((1L, "a"), (2L, "b")).toDF("id", "payload")
        .withColumn("__batch_id", lit(0L)),
      dir, Seq("__batch_id"))
    val afterReplay = spark.read.parquet(dir)
      .select($"id", $"payload").as[(Long, String)].collect().toSeq
    assert(afterReplay.length === 2)     // no duplicates from the replay
    // and the stream continues cleanly with the next batch
    mem.addData((3L, "c"))
    run()
    val all = spark.read.parquet(dir)
      .select($"id").as[Long].collect().sorted.toSeq
    assert(all === Seq(1L, 2L, 3L))
  }

  test("durable paragraph dedup: two-batch stream ≡ batch operator replay") {
    implicit val sqlCtx = spark.sqlContext
    // batch 2 repeats cells from batch 1 (cross-batch), from its own
    // batch (doc 4 vs doc 3), and introduces fresh cells — arrival
    // order agrees with doc-id order, the stated equivalence contract
    val b1 = Seq(SDoc(1, "alpha beta\n\nshared one"),
      SDoc(2, "shared one\n\ngamma"))
    val b2 = Seq(SDoc(3, "delta\n\nshared one\n\nalpha beta"),
      SDoc(4, "epsilon\n\ndelta"))
    val mem = MemoryStream[SDoc]
    val q = paragraphDedupStream(mem.toDF(), "doc_id", "text", "\n\n")
      .writeStream.outputMode("append")
      .format("memory").queryName("pdedup_out").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("pdedup_out")
      .as[(Long, Int, String)].collect()
    val streamTexts = streamed.groupBy(_._1).map { case (id, cells) =>
      id -> cells.sortBy(_._2).map(_._3).mkString("\n\n") }
    val batch = graft.dedup.ParagraphDedup
      .dedupParagraphs((b1 ++ b2).toDF(), "doc_id", "text", "\n\n")
      .select($"doc_id", $"text_dedup").as[(Long, String)].collect().toMap
    assert(batch.keySet === Set(1L, 2L, 3L, 4L))
    batch.foreach { case (id, want) =>
      assert(streamTexts.getOrElse(id, "") === want,
        s"doc $id: stream ≠ batch")
    }
  }

  test("durable exact dedup: first occurrence survives across batches") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(SDoc(1, "hello world"), SDoc(2, "unique two"))
    // doc 3 duplicates doc 1 up to normalization (cross-batch), doc 5
    // duplicates doc 4 inside its own batch
    val b2 = Seq(SDoc(3, "Hello   World"), SDoc(4, "unique four"),
      SDoc(5, "unique four"))
    val mem = MemoryStream[SDoc]
    val q = firstSeenDedupStream(mem.toDF(), "doc_id", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("fsdedup_out").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val kept = spark.table("fsdedup_out").select($"doc_id")
      .as[Long].collect().toSet
    val batchKeep = graft.dedup.Dedup
      .exact((b1 ++ b2).toDF(), "doc_id", "text")
      .select($"keep_id").as[Long].collect().toSet
    assert(kept === batchKeep)
    assert(kept === Set(1L, 2L, 4L))
  }

  test("streaming sessionization matches batch semantics for closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val sessions = sessionize(spark, mem.toDS(), useTimeout = false)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    val closed = spark.table("sess_out").collect()
    q.stop()
    // the first user-10 session (events at min 0,5) must close when the
    // min-90 event arrives in the same batch
    assert(closed.exists(r => r.getAs[Long]("user_id") == 10 &&
      r.getAs[Long]("n_events") == 2 &&
      math.abs(r.getAs[Double]("sum_value") - 3.0) < 1e-9))
  }

  test("streaming EWMA state finalizes to the batch fold across batches") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(
      Event(1, ts(0), 7, "m", 8.0), Event(2, ts(1), 7, "m", 4.0),
      Event(3, ts(0), 8, "m", 2.5))
    val b2 = Seq(
      Event(4, ts(2), 7, "m", 16.0),
      Event(5, ts(1), 8, "m", 7.25))
    val mem = MemoryStream[Event]
    val q = EventStreams.ewmaStream(mem.toDS(), alpha = 0.25)
      .writeStream.outputMode("update")
      .format("memory").queryName("ewma_out").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    // LAST update per user is the final state
    val streamed = spark.table("ewma_out").collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) =>
        val last = rs.maxBy(_.getAs[Long]("n_events"))
        u -> (last.getAs[Long]("n_events"), last.getAs[Double]("ewma"))
      }
    val batch = graft.ops.TimeSeries.ewma((b1 ++ b2).toDF(),
        "user_id", "ts", "event_id", "value", alpha = 0.25)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(streamed === batch)
    // hand value for user 7: y=8 → 0.25·4+0.75·8=7 → 0.25·16+0.75·7=9.25
    assert(streamed(7L) === ((3L, 9.25)))
  }

  test("streaming Markov transitions ≡ batch lead-window pairs, " +
      "including the cross-batch boundary") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(
      Event(1, ts(0), 7, "view", 0.0), Event(2, ts(1), 7, "click", 0.0),
      Event(3, ts(0), 8, "signup", 0.0))
    val b2 = Seq(
      Event(4, ts(2), 7, "purchase", 0.0), // boundary: click → purchase
      Event(5, ts(1), 8, "view", 0.0),
      Event(6, ts(2), 8, "purchase", 0.0))
    val mem = MemoryStream[Event]
    val q = EventStreams.markovStream(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("markov_out").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("markov_out")
      .groupBy($"from_type", $"to_type").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val batch = (b1 ++ b2).toDF()
      .withColumn("to_type", lead($"event_type", 1).over(w))
      .filter($"to_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"to_type").count()
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed === batch)
    assert(streamed(("click", "purchase")) === 1L, "cross-batch transition")
  }

  test("streaming attribution credits ≡ batch interval-join credits, " +
      "horizon pruning excludes stale touches") {
    implicit val sqlCtx = spark.sqlContext
    def tsDay(d: Int, min: Int) =
      new java.sql.Timestamp(1700000000000L + d * 86400000L + min * 60000L)
    // user 7: two touches then a purchase (split credit), a later
    // purchase whose only in-window touch is the 1-day-old view, and
    // one touch OLDER than 7 days before the last purchase (excluded).
    // user 8: touchless purchase → 'direct'.
    val b1 = Seq(
      Event(1, tsDay(0, 0), 7, "click", 0.0),
      Event(2, tsDay(0, 5), 7, "view", 0.0),
      Event(3, tsDay(0, 10), 7, "purchase", 33.34),
      Event(4, tsDay(0, 0), 8, "purchase", 10.0))
    val b2 = Seq(
      Event(5, tsDay(9, 0), 7, "view", 0.0),
      Event(6, tsDay(9, 30), 7, "purchase", 50.0)) // only event 5 in window
    val mem = MemoryStream[Event]
    val q = EventStreams.attributionStream(mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attr_out")
      .groupBy($"channel").agg(sum($"micro").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch twin: the qAttribution frame algebra on the same rows
    val ev = (b1 ++ b2).toDF()
      .select($"user_id", $"ts", $"event_id", $"event_type",
        round($"value" * 100).cast("long").as("cents"))
    val conv = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("cts"), $"event_id".as("cid"), $"cents")
    val touch = ev.filter($"event_type" =!= "purchase")
      .select($"user_id", $"ts".as("tts"), $"event_type".as("channel"))
    val pairs = conv.join(touch, Seq("user_id"))
      .filter($"tts" < $"cts" && $"tts" >= $"cts" - expr("INTERVAL 7 DAYS"))
    val n = pairs.groupBy($"cid").agg(count(lit(1)).as("n"))
    val credited = pairs.groupBy($"cid", $"cents", $"channel")
      .agg(count(lit(1)).as("cnt")).join(n, Seq("cid"))
      .select($"channel", ($"cnt" * round($"cents".cast("double") * 1000000.0 /
        $"n".cast("double")).cast("long")).as("micro"))
    val direct = conv.join(pairs.select($"cid").distinct(), Seq("cid"),
        "left_anti")
      .select(lit("direct").as("channel"), ($"cents" * 1000000L).as("micro"))
    val batch = credited.unionByName(direct)
      .groupBy($"channel").agg(sum($"micro").as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
    // hand checks: 33.34 split 2 ways → 1667000000 micro each;
    // event-5 view alone gets all of 50.00; user 8 is direct
    assert(streamed("click") === 1667000000L)
    assert(streamed("view") === 1667000000L + 5000000000L)
    assert(streamed("direct") === 1000000000L)
  }
}
