package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming extension of the engine (SURVEY §2.11: the
  * reference is pure batch; incremental ingest of new API pulls is the
  * natural streaming extension). The same transforms run identically
  * over `readStream` (incremental) and `read` (backfill) inputs —
  * declare once, bind either source.
  *
  * Scale design: windowed aggs carry watermarks so state is bounded;
  * sessionization uses flatMapGroupsWithState with an explicit timeout
  * rather than unbounded buffering.
  */
object EventStreams {

  /** Default tie-break columns for [[sessionizeBatch]] — applied only
    * when present in the input frame (reference identity of this Seq
    * marks "caller did not choose").
    */
  val DefaultTieCols: Seq[String] = Seq("event_id")

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Per-window HLL registers over a streaming (or batch) event frame
    * — approximate distinct users per tumbling window at unbounded
    * cardinality. The insight that makes this stream-native: HLL
    * sketch state IS a per-(window, register) MAX, so Structured
    * Streaming maintains it as an ordinary watermarked windowed
    * aggregation — bounded state (≤ 2^b rows per open window), no
    * custom stateful operator, no UDAF, append-mode emission once the
    * watermark closes the window. Register semantics are EXACTLY
    * [[graft.sketch.Hll.registers]] (same portable hash, same
    * string-exact rank), so finalized streaming registers equal the
    * batch sketch bit-for-bit and estimates follow from
    * [[graft.sketch.Hll.estimateFromRegisters]]-style finalization
    * downstream.
    *
    * Output: (window_start, reg_idx, reg_rank).
    */
  /** @param slide SLIDING-window stride (default = `window_`, i.e.
    *               tumbling). An event lands in window/slide
    *               overlapping windows, so open-window state scales by
    *               that factor — still ≤ 2^b rows each, still bounded.
    */
  def hllRegistersStream(events: DataFrame, valueCol: String = "user_id",
      window_ : String = "1 hour", watermark: String = "2 hours",
      b: Int = graft.sketch.Hll.defaultB,
      slide: Option[String] = None): DataFrame =
    graft.sketch.Hll.registers(
      events.withWatermark("ts", watermark)
        .select(window(col("ts"), window_, slide.getOrElse(window_)).as("w"),
          col(valueCol)),
      Seq("w"), valueCol, b)
      .select(col("w.start").as("window_start"), col("reg_idx"),
        col("reg_rank"))

  /** Per-window count-min counters over a streaming (or batch) event
    * frame — approximate per-window frequency tables at unbounded key
    * cardinality, the companion of [[hllRegistersStream]] for the
    * "how often" question. CMS state IS a per-(window, row, bucket)
    * COUNT, so the stream maintains it as one watermarked windowed
    * aggregation with ≤ depth·w rows of state per open window; rows
    * emit in append mode once the watermark closes the window, and the
    * counters equal [[graft.sketch.CountMin.counters]] on the same
    * rows bit-for-bit (shared hash coefficients). Point-estimate
    * downstream by joining probes per [[graft.sketch.CountMin.estimate]].
    *
    * Output: (window_start, cm_row, cm_bucket, cnt).
    */
  def cmsCountersStream(events: DataFrame, valueCol: String = "event_type",
      window_ : String = "1 hour", watermark: String = "2 hours",
      w: Int = 1024): DataFrame =
    graft.sketch.CountMin.counters(
      events.withWatermark("ts", watermark)
        .select(window(col("ts"), window_).as("w"), col(valueCol)),
      Seq("w"), valueCol, w)
      .select(col("w.start").as("window_start"), col("cm_row"),
        col("cm_bucket"), col("cnt"))

  /** Per-window top-k events by value within each event type — the
    * leaderboard query as an ordinary watermarked windowed
    * aggregation: [[graft.functions.TopKAgg]]'s O(k) heap buffer IS
    * the state Structured Streaming checkpoints (the same
    * sketch-as-aggregate discipline as [[hllRegistersStream]]'s
    * registers), so no custom stateful operator, no per-window full
    * sort, bounded state per open (window, type) group, append-mode
    * emission at watermark close. Values quantized to integer micros
    * (the repo's cross-engine ordering discipline); ranks 1..k with
    * event_id as the deterministic tie-break. Works identically on a
    * batch frame — the spec's equivalence gate.
    */
  def topKStream(events: DataFrame, k: Int = 3, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .select(window(col("ts"), window_).as("w"), col("event_type"),
        round(col("value") * 1e6).cast(LongType).as("micros"), col("event_id"))
      .groupBy(col("w"), col("event_type"))
      .agg(graft.functions.TopKAgg.top_k_by(col("micros"), col("event_id"), k)
        .as("top"))
      .select(col("w.start").as("window_start"), col("event_type"),
        posexplode(col("top")).as(Seq("p", "t")))
      .select(col("window_start"), col("event_type"),
        (col("p") + 1).cast(LongType).as("rnk"),
        col("t.ord").as("value_micros"), col("t.payload").as("event_id"))

  /** Per-window fixed-bin value histograms — the streaming leg of the
    * drift monitor ([[graft.ops.Drift]]): histogram state IS a
    * per-(window, group, bin) COUNT, so the stream maintains it as one
    * watermarked windowed aggregation with ≤ groups·bins rows per open
    * window (the same sketch-as-aggregate discipline as
    * [[hllRegistersStream]]), emitted append-mode at watermark close.
    * Binning is [[graft.ops.Drift.binIndex]] — shared with the batch
    * histogram, so closed windows equal the batch twin bit-for-bit and
    * [[graft.ops.Drift.driftVsReference]] finalizes TV per window
    * downstream (a monitoring job's alert surface).
    *
    * Output: (window_start, groupCol, bin, cnt).
    */
  def histogramStream(events: DataFrame, valueCol: String = "value",
      groupCol: String = "event_type", lo: Double = 0.0, hi: Double = 100.0,
      bins: Int = 16, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    graft.ops.Drift.histogram(
      events.withWatermark("ts", watermark)
        .select(window(col("ts"), window_).as("w"), col(groupCol),
          col(valueCol)),
      Seq("w", groupCol), valueCol, lo, hi, bins)
      .select(col("w.start").as("window_start"), col(groupCol), col("bin"),
        col("cnt"))

  /** Per-window IVF cell occupancy for a STREAM of embeddings — the
    * index-maintenance twin of [[graft.sim.KMeans.assignDist]]: cell
    * assignment against a trained model is a pure literal-centroid
    * projection (no join, no shuffle — exactly why it streams without
    * custom state), and the per-(window, cell) count is one
    * watermarked windowed aggregation with ≤ k rows of state per open
    * window. An ops job reads the closed windows for index health:
    * occupancy drifting across windows = the embedding distribution
    * moved and the coarse quantizer needs retraining — the
    * vector-space sibling of [[histogramStream]]'s score drift.
    *
    * Input needs (ts, vecCol). Output: (window_start, cluster, n).
    */
  def ivfAssignStream(vectors: DataFrame, vecCol: String,
      model: graft.sim.KMeans.Model, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    vectors.withWatermark("ts", watermark)
      .select(window(col("ts"), window_).as("w"),
        graft.sim.KMeans.clusterOf(col(vecCol), model).as("cluster"))
      .groupBy(col("w"), col("cluster"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("cluster"), col("n"))

  /** Tumbling-window per-type counts/sums with a lateness watermark —
    * works on both batch and streaming DataFrames.
    */
  def windowedTypeCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("value_sum"))

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, nEvents: Long, sumValue: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Gap-based sessionization: a user's events belong to one session
    * until `gapMs` of inactivity. Custom state via
    * flatMapGroupsWithState — the engine's template for arbitrary
    * keyed streaming state.
    */
  /** @param useTimeout flush dangling sessions via processing-time
    *                    timeout. Disable for synchronous drains
    *                    (processAllAvailable never quiesces while
    *                    timeout batches keep re-firing).
    */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L,
      useTimeout: Boolean = true): Dataset[Session] = {
    import spark.implicits._
    def fn(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(userId, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.last), s.nEvents, s.sumValue))
      } else {
        val sorted = rows.toSeq.sortBy(_.ts.getTime)
        var closed = List.empty[Session]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.last <= gapMs =>
              cur = Some(s.copy(last = t, nEvents = s.nEvents + 1,
                sumValue = s.sumValue + e.value))
            case Some(s) =>
              closed ::= Session(userId, new java.sql.Timestamp(s.start),
                new java.sql.Timestamp(s.last), s.nEvents, s.sumValue)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          if (useTimeout) state.setTimeoutDuration(gapMs)
        }
        closed.reverseIterator
      }
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }

  /** Batch-shaped sessionization with identical semantics (gap split
    * via lag window), for backfill and for differential testing of the
    * streaming path.
    *
    * `tieCols` pins the order of rows sharing a timestamp: the lag
    * window and the running-sum window sort independently, so without
    * a total order two tied rows at a session boundary can land in
    * different relative positions per window and split one session in
    * two, nondeterministically. Pass the event's unique id (default)
    * or any column set that makes (ts, tieCols) unique per user.
    *
    * The DEFAULT is applied only when the frame actually has an
    * `event_id` column — a caller without one keeps the old
    * (order-nondeterministic on ties) behavior instead of failing.
    * An EXPLICITLY passed tie column that is missing still fails with
    * an AnalysisException: silently ignoring a requested determinism
    * key would be worse than the error.
    */
  def sessionizeBatch(events: DataFrame, gapMs: Long = 30 * 60 * 1000L,
      tieCols: Seq[String] = DefaultTieCols): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ties =
      if (tieCols eq DefaultTieCols) DefaultTieCols.filter(events.columns.contains)
      else tieCols
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts") +: ties.map(col): _*)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      // millisecond-exact gap (unix_millis) — casting to long truncates
      // to seconds and misclassifies boundary gaps; decimal sum for
      // order-independent, engine-reproducible totals
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMs)
          .cast(IntegerType))
      .withColumn("session_id", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).as("sum_value"))
      .drop("session_id")
  }

  case class EwmaState(micros: Double, n: Long)
  case class EwmaRow(user_id: Long, n_events: Long, ewma: Double)

  /** Streaming per-entity EWMA — the keyed-state twin of
    * [[graft.ops.TimeSeries.ewma]]: one EwmaState (an integral-micro
    * double + a count) per user, updated with the IDENTICAL quantized
    * recurrence, so a replayed stream finalizes to the batch answer
    * bit-for-bit (the quantization argument is TimeSeries's: with α a
    * multiple of 1/4 every step is an exact multiple of 0.25, and the
    * scale-0 HALF_UP round here is the same BigDecimal rounding
    * Spark's Round codegen applies in the batch fold).
    *
    * Within a micro-batch rows sort by (ts, event_id); ACROSS batches
    * arrival order is trusted (the mapGroupsWithState contract every
    * streaming leg here shares) — an out-of-order replay is batch
    * [[graft.ops.TimeSeries.ewma]]'s job.
    */
  def ewmaStream(events: Dataset[Event],
      alpha: Double = 0.25): Dataset[EwmaRow] = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    require(alpha * 4 == (alpha * 4).round.toDouble,
      "alpha must be a multiple of 1/4 (exact-quarters replay)")
    import events.sparkSession.implicits._
    def r0(v: Double): Double = // Spark Round(_, 0) semantics
      java.math.BigDecimal.valueOf(v)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    def r6(v: Double): Double =
      java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def fn(userId: Long, rows: Iterator[Event],
        state: GroupState[EwmaState]): EwmaRow = {
      // full-precision order key: ts.getTime is MILLIS and would tie
      // two events in the same millisecond, letting event_id decide a
      // fold order the batch twin (which sorts full-precision
      // timestamps) disagrees with — seconds·1e9 + nanos is the exact
      // Timestamp total order
      val sorted = rows.toSeq.sortBy(e =>
        (Math.floorDiv(e.ts.getTime, 1000L) * 1000000000L + e.ts.getNanos,
          e.event_id))
      var cur = state.getOption
      sorted.foreach { e =>
        val xm = r0(e.value * 1e6)
        cur = Some(cur match {
          case None => EwmaState(xm, 1L)
          case Some(s) =>
            EwmaState(r0(xm * alpha + s.micros * (1.0 - alpha)), s.n + 1L)
        })
      }
      val s = cur.get
      state.update(s)
      EwmaRow(userId, s.n, r6(s.micros / 1e6))
    }
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(fn)
  }

  case class MarkovState(lastKey: Long, lastId: Long, lastType: String)
  case class Transition(user_id: Long, from_type: String, to_type: String)

  /** Streaming journey transitions — the incremental twin of the
    * batch Markov matrix (PipelineQueries.qMarkov): per-user keyed
    * state holds only the LAST event (type + full-precision order
    * key), each micro-batch emits the consecutive-pair transitions in
    * (ts, event_id) order including the one across the batch
    * boundary, and a downstream count-by-(from,to) aggregation
    * reproduces the batch matrix exactly (spec-pinned). State is
    * O(1) per user — the bounded-state contract a perpetual journey
    * stream needs. Same full-precision order key as [[ewmaStream]]:
    * millis·10⁹ + nanos, so intra-millisecond ties resolve exactly
    * like the batch window's full-precision timestamp sort.
    *
    * Caveat (same as every mapGroups twin here): per-key events must
    * arrive in order ACROSS micro-batches — true for replayed logs
    * and watermarked upstreams. The stored order key POLICES the
    * contract: a batch row at or before the state's last (key, id) is
    * a cross-batch regression and is DROPPED rather than allowed to
    * emit a transition the batch twin would never produce;
    * out-of-order arrivals belong to the batch recompute path.
    */
  def markovStream(events: Dataset[Event]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    def key(e: Event): Long =
      Math.floorDiv(e.ts.getTime, 1000L) * 1000000000L + e.ts.getNanos
    def fn(userId: Long, rows: Iterator[Event],
        state: GroupState[MarkovState]): Iterator[Transition] = {
      val sorted = rows.toSeq.sortBy(e => (key(e), e.event_id))
      var prev = state.getOption
      val out = Seq.newBuilder[Transition]
      sorted.foreach { e =>
        val regressed = prev.exists(p =>
          Ordering[(Long, Long)].lteq((key(e), e.event_id),
            (p.lastKey, p.lastId)))
        if (!regressed) {
          prev.foreach(p => out += Transition(userId, p.lastType, e.event_type))
          prev = Some(MarkovState(key(e), e.event_id, e.event_type))
        }
      }
      prev.foreach(state.update)
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(fn)
  }

  case class TouchState(touches: Seq[(Long, String)],
      lastKey: Long, lastId: Long)
  case class CreditRow(user_id: Long, cid: Long, channel: String, micro: Long)

  /** Streaming linear multi-touch attribution — the incremental twin
    * of the batch query (PipelineQueries.qAttribution): per-user
    * keyed state holds only the touches inside the 7-day horizon
    * behind the newest processed event; each purchase emits one
    * integer micro-cent-share credit row per in-window touch
    * (round(cents·10⁶/n), the batch quantization) or a single
    * 'direct' row when no touch qualifies. A downstream
    * sum-by-channel reproduces the batch totals exactly (spec). State
    * is event-time bounded: touches older than horizon prune on every
    * batch — the contract a perpetual clickstream needs. Ordering
    * contract and regression-drop policing as in [[markovStream]].
    */
  def attributionStream(events: Dataset[Event],
      horizonNanos: Long = 7L * 86400L * 1000000000L):
      Dataset[CreditRow] = {
    import events.sparkSession.implicits._
    def key(e: Event): Long =
      Math.floorDiv(e.ts.getTime, 1000L) * 1000000000L + e.ts.getNanos
    def r0(v: Double): Double =
      java.math.BigDecimal.valueOf(v)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    def fn(userId: Long, rows: Iterator[Event],
        state: GroupState[TouchState]): Iterator[CreditRow] = {
      val sorted = rows.toSeq.sortBy(e => (key(e), e.event_id))
      val st0 = state.getOption
        .getOrElse(TouchState(Seq.empty, Long.MinValue, Long.MinValue))
      var buf = st0.touches
      var last = (st0.lastKey, st0.lastId)
      val out = Seq.newBuilder[CreditRow]
      sorted.foreach { e =>
        val k = key(e)
        // cross-batch regression: at or before the stored last event —
        // drop rather than credit/buffer out of order (markovStream policy)
        if (Ordering[(Long, Long)].gt((k, e.event_id), last)) {
          if (e.event_type == "purchase") {
            val cents = Math.round(e.value * 100)
            // strictly-before touches within [k - horizon, k)
            val in = buf.filter { case (tk, _) =>
              tk < k && tk >= k - horizonNanos }
            if (in.isEmpty)
              out += CreditRow(userId, e.event_id, "direct", cents * 1000000L)
            else {
              val micro = r0(cents.toDouble * 1000000.0 / in.size).toLong
              in.foreach { case (_, ch) =>
                out += CreditRow(userId, e.event_id, ch, micro)
              }
            }
          } else {
            buf = buf :+ (k, e.event_type)
          }
          last = (k, e.event_id)
          // prune anything the horizon can never reach again (buf is
          // append-ordered by key, so dropWhile is the sorted prune)
          buf = buf.dropWhile(_._1 < k - horizonNanos)
        }
      }
      state.update(TouchState(buf, last._1, last._2))
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout)(fn)
  }

  /** Streaming exact dedup — the incremental twin of
    * [[graft.dedup.Dedup.exact]]: the FIRST document per normalized-
    * content fingerprint passes, later copies are dropped. State is
    * bounded by the event-time watermark (dropDuplicatesWithinWatermark
    * keeps a fingerprint only until the watermark passes it), so a
    * perpetual ingest stream doesn't accumulate unbounded dedup state —
    * the contract a 100 TB/day training-data ingest needs. Duplicates
    * farther apart than the watermark horizon are deliberately NOT
    * caught here; periodic batch [[graft.dedup.Dedup.exact]] compaction
    * handles the long tail.
    */
  def dedupStream(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", graft.text.TextAnalysis.fingerprintHex(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      // dedup state is keyed on fp BEFORE this projection, so dropping
      // it is safe — and keeps the output schema identical to the
      // upstream docs frame (and to Dedup.exact's representatives)
      .drop("fp")

  /** Streaming incremental dedup against a STATIC reference corpus —
    * the streaming twin of
    * [[graft.dedup.Dedup.dropDuplicatesAgainst]]'s exact stage, for
    * the daily-ingest shape "drop arriving documents already in the
    * training corpus": a stream-static LEFT ANTI join on the
    * normalized-content fingerprint (static side re-read per
    * micro-batch, so a corpus snapshot swap is picked up without a
    * restart), composed with [[dedupStream]]'s watermark-bounded
    * in-stream dedup so repeats WITHIN the ingest window collapse
    * too.
    *
    * Scale shape: the reference side reduces to its distinct
    * fingerprint set (one column — at 10⁹ corpus docs that's tens of
    * GB, shuffled once per micro-batch as an ordinary equi-join;
    * pre-bucket the fingerprint table by fp to make it exchange-free);
    * stream state is only the within-watermark fingerprint horizon,
    * exactly [[dedupStream]]'s bound.
    */
  def dedupAgainstStream(docs: DataFrame, reference: DataFrame,
      tsCol: String, textCol: String,
      watermark: String = "1 hour"): DataFrame = {
    val fp = graft.text.TextAnalysis.fingerprintHex(col(textCol))
    val refFps = reference.select(fp.as("fp")).distinct()
    docs
      .withColumn("fp", fp)
      .withWatermark(tsCol, watermark)
      .join(refFps, Seq("fp"), "left_anti")
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")
  }

  /** A document admitted by [[firstSeenDedupStream]]. */
  final case class KeptDoc(doc_id: Long, text: String)

  /** A URL admitted by [[canonUrlDedupStream]]. */
  final case class KeptUrl(canon: String, doc_id: Long, url: String)

  /** DURABLE first-occurrence-wins CANONICAL-URL dedup — the
    * keyed-state twin of canonicalize-then-group
    * ([[graft.text.UrlOps.canonicalize]] + min-id ownership, the
    * `q_url_canon` batch rule) for a perpetual crawl frontier: each
    * distinct canonical key admits exactly one fetch ever; recrawl
    * and tracking-param variants drop against the full history
    * WITHOUT fetching the document body — this gate runs before the
    * fetcher, which is why it is the cheapest dedup in the stack.
    * State: one boolean per distinct canonical URL, NoTimeout (the
    * frontier's seen-set, the honest cost of crawl exactness).
    *
    * Unparseable URLs (canonicalize → NULL) key on their RAW string:
    * keying them on the shared NULL would admit the first malformed
    * URL ever seen and silently drop every later DISTINCT malformed
    * URL as its "duplicate" — exact-raw dedup is the only safe
    * semantics for the class the canonicalizer cannot read.
    */
  def canonUrlDedupStream(docs: DataFrame, idCol: String,
      urlCol: String): Dataset[KeptUrl] = {
    import docs.sparkSession.implicits._
    val keyed = docs.select(
        coalesce(graft.text.UrlOps.canonicalize(col(urlCol)),
          col(urlCol).cast(StringType)).as("canon"),
        col(idCol).cast(LongType).as("doc_id"),
        col(urlCol).cast(StringType).as("url"))
      .as[(String, Long, String)]
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(String, Long, String)],
            state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = rows.minBy(_._2)
            Iterator(KeptUrl(first._1, first._2, first._3))
          }
        })
  }

  /** A paragraph cell admitted by [[paragraphDedupStream]]. */
  final case class KeptCell(doc_id: Long, idx: Int, para: String)

  /** DURABLE first-occurrence-wins exact dedup — the keyed-state twin
    * of [[graft.dedup.Dedup.exact]] for a perpetual ingest stream:
    * each distinct normalized-content fingerprint admits exactly ONE
    * document, ever (within a micro-batch, the min doc id — the batch
    * representative rule), and every later arrival is dropped against
    * the FULL history without re-running batch dedup.
    *
    * This deliberately complements [[dedupStream]]'s bounded horizon:
    * there, state expires at the watermark (cheap, but far-apart
    * duplicates survive); here, state is one boolean per distinct
    * fingerprint under NoTimeout — the state store holds exactly the
    * group table the batch job would shuffle (|distinct docs| keys),
    * which is the honest cost of exactness across unbounded time.
    * Run it on the deduped/curated tail of the pipeline where
    * distinct cardinality is the DOCUMENT count, and let the state
    * store (RocksDB in production) spill it off-heap.
    */
  def firstSeenDedupStream(docs: DataFrame, idCol: String,
      textCol: String): Dataset[KeptDoc] = {
    import docs.sparkSession.implicits._
    val keyed = docs.select(
        graft.text.TextAnalysis.fingerprintHex(col(textCol)).as("fp"),
        col(idCol).cast(LongType).as("doc_id"),
        col(textCol).cast(StringType).as("text"))
      .as[(String, Long, String)]
    keyed.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(String, Long, String)],
            state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = rows.minBy(_._2)
            Iterator(KeptDoc(first._2, first._3))
          }
        })
  }

  /** DURABLE first-occurrence-wins PARAGRAPH dedup — the keyed-state
    * twin of [[graft.dedup.ParagraphDedup]]: arriving documents split
    * at `delim`, each distinct paragraph hash admits exactly one cell
    * ever (min (doc, idx) within a micro-batch — the batch packed-
    * ownership rule), later copies drop against the full history.
    * Emits the admitted cells (doc_id, idx, para); reassembly is one
    * ordinary per-document aggregate downstream (in foreachBatch or a
    * batch pass), kept OUT of this operator so the streaming query has
    * a single stateful stage.
    *
    * When arrival order agrees with doc-id order, the admitted set is
    * EXACTLY the batch operator's kept set on the concatenated corpus
    * — EventStreamsSpec pins stream ≡ batch on a replayed two-batch
    * corpus. State: one boolean per distinct paragraph, NoTimeout —
    * the batch owner table's footprint, held incrementally.
    */
  def paragraphDedupStream(docs: DataFrame, idCol: String,
      textCol: String, delim: String): Dataset[KeptCell] = {
    import docs.sparkSession.implicits._
    val cells = docs
      .select(col(idCol).cast(LongType).as("doc_id"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(delim))).as(Seq("idx", "para")))
      .filter(trim(col("para")) =!= "")
      .select(graft.text.TextAnalysis.hash60(col("para")).as("h"),
        col("doc_id"), col("idx"), col("para"))
      .as[(Long, Long, Int, String)]
    cells.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[(Long, Long, Int, String)],
            state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = rows.minBy(r => (r._2, r._3))
            Iterator(KeptCell(first._2, first._3, first._4))
          }
        })
  }

  /** Streaming corpus gate — the incremental twin of the batch
    * curation pipeline's filter+dedup prefix (queries.PipelineQueries
    * qCorpusPipeline): language gate → quality gate → watermark-bounded
    * exact dedup, composed as one incremental transform. The gate
    * expressions are the same native one-pass kernels the batch path
    * uses (graft.functions.LangIdExpr / QualityScoreExpr), so batch and
    * streaming admit the SAME documents — the property the spec pins.
    * State: only the dedup fingerprints within the watermark horizon
    * (the stateless gates add none).
    */
  def corpusGateStream(docs: DataFrame, tsCol: String, textCol: String,
      lang: String = "en", minQuality: Double = 0.65,
      watermark: String = "1 hour"): DataFrame =
    dedupStream(
      docs.filter(
        graft.text.TextAnalysis.langId(col(textCol)) === lang &&
          graft.text.TextAnalysis.qualityScore(col(textCol)) >= minQuality),
      tsCol, textCol, watermark)

  /** Streaming twin of [[graft.text.Decontaminate]]: gate a document
    * ingest stream against a STATIC benchmark's n-gram set. The
    * benchmark grams collect to the driver ONCE (bounded:
    * eval-suite-sized — the same driver-held-model discipline as the
    * k-means centroids) and bind into the native
    * [[graft.functions.LongSetContainsAny]] kernel (sorted once,
    * binary-searched per gram — an arrays_overlap literal would
    * rebuild its lookup set on every row at ingest rate), so the gate
    * is one narrow stateless filter: no join, no watermark, no
    * shuffle, and the decision per doc is exactly the batch audit's
    * `contaminated = 0` (spec-pinned equivalence).
    */
  def decontamGateStream(docs: DataFrame, textCol: String,
      bench: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    val benchGrams: Array[Long] = bench
      .select(explode(
        graft.text.Decontaminate.gramSet(col(benchTextCol), n)).as("h"))
      .distinct().collect().map(_.getLong(0))
    docs.filter(!graft.functions.TextHashes.set_contains_any(
      graft.text.Decontaminate.gramSet(col(textCol), n), benchGrams))
  }

  /** Streaming blocklist gate — the ingest twin of the batch
    * `q_blocklist_gate` rule: drop any arriving document whose
    * lowercased text contains ≥1 dictionary term. The Aho–Corasick
    * automaton ([[graft.functions.Blocklist]]) is compiled once on
    * the driver and rides the generated code as a reference object
    * (the decontam-gate driver-held-model discipline), so the gate is
    * one narrow stateless codegen'd filter — no join, no watermark,
    * no shuffle, no per-batch state — and matches the whole
    * dictionary in one pass per document at ingest rate.
    */
  def blocklistGateStream(docs: DataFrame, textCol: String,
      dict: Seq[String]): DataFrame =
    docs.filter(graft.functions.Blocklist
      .blocklist_hits(lower(col(textCol)), dict)
      .getField("hits") === 0)

  /** Streaming SEMANTIC decontamination gate — the embedding-space
    * twin of [[decontamGateStream]], gating an ingest stream against
    * [[graft.sim.SemanticDecontam]]'s batch verdict: the eval-suite
    * vectors (bounded — the driver-held-model discipline) are
    * collected ONCE with their engine-computed norms and carried as a
    * codegen REFERENCE OBJECT by the [[graft.functions.MaxCosine]]
    * kernel — one narrow stateless filter per row, O(1) plan size in
    * the eval count (a greatest(...) tree of per-eval typedLit arrays
    * would re-optimize thousands of literal children every
    * micro-batch). A row passes iff the batch report would say
    * contaminated = false (spec-pinned equivalence; the kernel's fold
    * order and cosine operand order are bit-identical to
    * [[graft.sim.SemanticDecontam.report]]).
    */
  def semanticGateStream(docs: DataFrame, vecCol: String,
      evalSet: DataFrame, evalVecCol: String, tau: Double): DataFrame = {
    import graft.sim.Ann
    val evs: Array[(Seq[Double], Double)] = evalSet
      .select(transform(col(evalVecCol), x => x.cast(DoubleType))
        .as("v"), Ann.norm(col(evalVecCol)).as("n"))
      .collect()
      .map(r => (r.getSeq[Double](0), r.getDouble(1)))
    require(evs.nonEmpty, "empty eval set would pass everything")
    docs.filter(graft.functions.MaxCosine.max_cosine(col(vecCol),
      evs.map(_._1).toSeq, evs.map(_._2).toSeq) < tau)
  }

  /** Stream-static enrichment: every micro-batch of the stream joined
    * to a static dimension snapshot. Stateless — the dim is broadcast
    * per batch, no watermark and no join state; the streaming analog of
    * the reference's dimension joins (src/nass.sql:470). Works
    * identically on batch frames (broadcast left join), which is what
    * the spec pins.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys, "left")

  /** Watermarked stream-stream inner join: left and right events match
    * on key with the right timestamp within ±`within` of the left.
    * Both sides carry event-time watermarks AND the join condition
    * bounds the time skew, so each side's buffered state is evictable
    * once the watermark passes — the two conditions Structured
    * Streaming needs to avoid unbounded join state. All four column
    * names must be distinct (stream-stream joins cannot share
    * attribute names across sides). On batch frames `withWatermark` is
    * a no-op and this degrades to the equivalent range join — the
    * differential-testing twin.
    */
  def joinStreamsWithin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      within: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val iv = expr(s"INTERVAL $within")
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) - iv &&
          col(rightTs) <= col(leftTs) + iv)
  }

  /** Idempotent foreachBatch sink: each micro-batch overwrites its own
    * `__batch_id` partition, so replaying a batch after a failure
    * rewrites the same partition instead of appending duplicates —
    * exactly-once OUTPUT on top of at-least-once batch delivery, the
    * standard production sink pattern when the target is a plain file
    * layout rather than a transactional table. Failure mid-write
    * leaves a partial partition that the replay fully replaces
    * (dynamic partition overwrite).
    */
  def startIdempotentSink(df: DataFrame, sinkDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.ParquetSink.overwritePartitions(
          batch.withColumn("__batch_id", lit(batchId)),
          sinkDir, Seq("__batch_id"))
      }
      .start()

  /** Gate a document ingest stream against the PERSISTED near-dup
    * band index ([[graft.dedup.IncrementalDedup]]): each micro-batch
    * runs the full batch classification (band probe into the bucketed
    * state, agreement gate, deterministic best-match) via
    * foreachBatch — the sanctioned pattern for reusing batch logic
    * that needs static-table joins plus aggregation a pure streaming
    * plan cannot express in append mode — and lands the classified
    * rows partitioned by batch id (idempotent on replay: a re-run
    * batch overwrites its own partition with identical content, since
    * classification against the static state is deterministic).
    *
    * The state table is NOT advanced per batch here — admission policy
    * (when to [[graft.dedup.IncrementalDedup.appendAcceptedNear]] the
    * kept rows) stays with the caller, because gating and state
    * growth are separate decisions in a production ingest (e.g. gate
    * now, append only after downstream quality checks pass).
    */
  def nearDedupGateSink(docs: DataFrame, stateTable: String,
      idCol: String, textCol: String, sinkDir: String,
      checkpointDir: String, w: Int = 3, minAgreement: Double = 0.75)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val classified = graft.dedup.IncrementalDedup.nearDedupAgainst(
          batch.sparkSession, stateTable, batch, idCol, textCol,
          w, minAgreement)
        graft.sources.ParquetSink.overwritePartitions(
          classified.withColumn("__batch_id", lit(batchId)),
          sinkDir, Seq("__batch_id"))
      }
      .start()

  /** Streaming CDC materialization: fold each micro-batch of change
    * rows into a parquet snapshot with [[graft.ops.Upsert]] — the
    * streaming twin of the batch changelog application, giving a
    * continuously-maintained latest-version-per-key table. Each batch
    * reads the current snapshot, applies itself (latest version wins;
    * tombstone versions are RETAINED with a `__deleted` marker so
    * late out-of-order upserts cannot resurrect deleted keys — read
    * live rows via [[readCdcSnapshot]]), and atomically replaces the
    * snapshot via write-to-staging + directory swap with a
    * restore-from-backup recovery step; a replayed batch re-applies
    * idempotently because the max_by fold is idempotent for
    * already-seen versions.
    *
    * Scale note: per-batch cost is one key-partitioned max_by shuffle
    * over snapshot ∪ batch. For snapshots too large to rewrite per
    * batch, partition the snapshot by key range and rewrite only
    * partitions a batch touches (the ParquetSink.overwritePartitions
    * pattern); the fold itself is unchanged.
    */
  def startCdcSnapshot(changes: DataFrame, snapshotDir: String,
      checkpointDir: String, keyCols: Seq[String], versionCols: Seq[String],
      isDelete: org.apache.spark.sql.Column)
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // Hadoop FS paths, not java.io.File: the snapshot may live on
        // any scheme Spark can read (file:, hdfs:, ...). Renames are
        // atomic on HDFS/local; on object stores use a manifest-table
        // format instead of this directory-swap sink.
        val conf = spark.sparkContext.hadoopConfiguration
        val dir = new org.apache.hadoop.fs.Path(snapshotDir)
        val fs = dir.getFileSystem(conf)
        val old = new org.apache.hadoop.fs.Path(snapshotDir + ".old")
        val staging = new org.apache.hadoop.fs.Path(snapshotDir + ".staging")
        // crash recovery: a death between stage-out and promote leaves
        // the previous snapshot in .old — restore it BEFORE reading,
        // or the replayed batch would rebuild from empty and silently
        // drop every previously upserted key
        if (!fs.exists(dir) && fs.exists(old) && !fs.rename(old, dir))
          throw new java.io.IOException(s"cannot restore $old")
        // the persisted snapshot RETAINS tombstone versions: without
        // them, a late out-of-order upsert arriving after a delete
        // would resurrect the key with pre-delete data
        val base =
          if (fs.exists(dir)) spark.read.parquet(snapshotDir)
            .select((batch.columns :+ "__deleted").map(col): _*)
          else batch.limit(0).withColumn("__deleted", lit(false))
        val next = graft.ops.Upsert.applyChangelogRetain(
          base, batch, keyCols, versionCols, isDelete)
        next.write.mode("overwrite").parquet(staging.toString)
        // swap: readers see the old or the new directory, never a
        // partial write; every step below is idempotent under replay
        if (fs.exists(old)) fs.delete(old, true)
        if (fs.exists(dir) && !fs.rename(dir, old))
          throw new java.io.IOException(s"cannot stage out $snapshotDir")
        if (!fs.rename(staging, dir))
          throw new java.io.IOException(s"cannot promote $staging")
        fs.delete(old, true)
        ()
      }
      .start()

  /** Live rows of a CDC snapshot written by [[startCdcSnapshot]]
    * (tombstones filtered).
    */
  def readCdcSnapshot(spark: SparkSession, snapshotDir: String): DataFrame =
    spark.read.parquet(snapshotDir).where(!col("__deleted")).drop("__deleted")

  /** Incremental pipeline wiring: parquet source dir → windowed agg →
    * parquet sink with checkpoint. The streaming twin of the batch
    * hourly rollup.
    */
  def startHourlyPipeline(spark: SparkSession, srcDir: String, sinkDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val src = spark.readStream.schema(eventSchema).parquet(srcDir)
    windowedTypeCounts(src)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", sinkDir)
      .start()
  }
}
