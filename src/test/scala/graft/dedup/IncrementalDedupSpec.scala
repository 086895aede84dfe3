package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, "epsilon zeta eta theta"),
    (3L, "Alpha  beta   GAMMA delta"), // normalizes equal to doc 1
    (4L, "iota kappa lambda mu")).toDF("doc_id", "text")

  test("classification: dup_of_state / dup_in_batch / kept, owners correct") {
    val table = "incr_spec_state"
    try {
      IncrementalDedup.ensureState(corpus, "doc_id", "text", table, 4)
      val batch = Seq(
        (10L, "alpha beta gamma delta"),  // = state content, owner 1
        (11L, "nu xi omicron pi"),        // new → kept
        (12L, "nu  XI omicron pi"),       // dup of 11 within batch
        (13L, "rho sigma tau")).toDF("doc_id", "text")
      val out = IncrementalDedup.dedupAgainst(spark, table, batch,
        "doc_id", "text").collect()
        .map(r => r.getLong(0) -> (r.getString(2), r.getLong(3))).toMap
      assert(out(10L) === ("dup_of_state", 1L))
      assert(out(11L) === ("kept", 11L))
      assert(out(12L) === ("dup_in_batch", 11L))
      assert(out(13L) === ("kept", 13L))
      // the append law: kept rows' fingerprints extend the state
      val keptIds = IncrementalDedup.kept(
        IncrementalDedup.dedupAgainst(spark, table, batch, "doc_id", "text"))
        .select("doc_id").as[Long].collect().toSet
      assert(keptIds === Set(11L, 13L))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("ensureState reuses on identical corpus, rebuilds on drift") {
    val table = "incr_spec_reuse"
    try {
      assert(IncrementalDedup.ensureState(corpus, "doc_id", "text", table, 4))
      assert(!IncrementalDedup.ensureState(corpus, "doc_id", "text", table, 4))
      val drifted = corpus.filter($"doc_id" =!= 4L)
      assert(IncrementalDedup.ensureState(drifted, "doc_id", "text", table, 4))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("TEXT-only drift (same ids) forces a rebuild, and the rebuilt " +
      "state serves the new content") {
    val table = "incr_spec_textdrift"
    try {
      assert(IncrementalDedup.ensureState(corpus, "doc_id", "text", table, 4))
      // same ids, same count — doc 2's content edited in place
      val edited = corpus.withColumn("text",
        when($"doc_id" === 2L, lit("edited replacement content"))
          .otherwise($"text"))
      assert(IncrementalDedup.ensureState(edited, "doc_id", "text", table, 4),
        "a text-only re-ingest must register as corpus drift")
      // a batch dup of the NEW content resolves against the new state
      val batch = Seq((20L, "edited  REPLACEMENT content"))
        .toDF("doc_id", "text")
      val out = IncrementalDedup.dedupAgainst(spark, table, batch,
        "doc_id", "text").collect().head
      assert(out.getString(2) === "dup_of_state")
      assert(out.getLong(3) === 2L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("probe-side plan: no exchange anywhere above the bucketed state scan") {
    val table = "incr_spec_plan"
    val docs = Tables.documents(spark, sf)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      IncrementalDedup.ensureState(docs, "doc_id", "text", table, 8)
      // AQE off so the executed plan is inspectable; broadcast off so
      // the state side would otherwise be exchanged for a shuffle join
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batch = docs.filter($"doc_id" % 3 === 0)
        .select(($"doc_id" + 1000L).as("doc_id"), $"text")
      val df = IncrementalDedup.dedupAgainst(spark, table, batch,
        "doc_id", "text")
      val plan = df.queryExecution.executedPlan
      // the state scan must exist…
      val stateScans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.toString.contains("graft_incr_state") ||
              f.relation.location.rootPaths.exists(
                _.toString.contains("incr_spec_plan")) => f
      }
      assert(stateScans.nonEmpty, plan.toString)
      // …and no shuffle exchange may have it in its subtree: the
      // state side streams pre-bucketed, only the batch side moves
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(exchanges.nonEmpty, "sanity: the batch side does shuffle")
      exchanges.foreach { e =>
        val below = e.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths.exists(
                _.toString.contains("incr_spec_plan")) => f
        }
        assert(below.isEmpty,
          s"state scan found under a shuffle exchange:\n$plan")
      }
      // values unaffected by the plan discipline
      assert(df.count() === batch.count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("near state: verbatim and suffixed recrawls flag, fresh text keeps") {
    val table = "incr_spec_near"
    try {
      // long docs: enough shingles that a short suffix stays ≥ 0.75
      val docs = Seq(
        (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
          "lambda mu nu xi omicron pi rho sigma tau upsilon"),
        (2L, "one two three four five six seven eight nine ten eleven " +
          "twelve thirteen fourteen fifteen sixteen")).toDF("doc_id", "text")
      IncrementalDedup.ensureNearState(docs, "doc_id", "text", table, 4)
      val batch = Seq(
        (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
          "lambda mu nu xi omicron pi rho sigma tau upsilon"), // verbatim
        (11L, "one two three four five six seven eight nine ten eleven " +
          "twelve thirteen fourteen fifteen sixteen extra suffix"), // near
        (12L, "totally different content with zero shared shingles here"))
        .toDF("doc_id", "text")
      val out = IncrementalDedup.nearDedupAgainst(spark, table, batch,
        "doc_id", "text").collect()
        .map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(out(10L)._1 === "near_dup_of_state")
      assert(out(10L)._2 === 1L)
      assert(out(10L)._3 === 1.0, "verbatim copy agrees on every minhash")
      assert(out(11L)._1 === "near_dup_of_state")
      assert(out(11L)._2 === 2L)
      assert(out(11L)._3 >= 0.75 && out(11L)._3 < 1.0)
      assert(out(12L) === (("kept", -1L, 0.0)))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("near probe plan: no exchange above the bucketed band-index scan") {
    val table = "incr_spec_near_plan"
    val docs = Tables.documents(spark, sf)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      IncrementalDedup.ensureNearState(docs, "doc_id", "text", table, 8)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batch = docs.filter($"doc_id" % 5 === 0)
        .select(($"doc_id" + 1000L).as("doc_id"), $"text")
      val df = IncrementalDedup.nearDedupAgainst(spark, table, batch,
        "doc_id", "text")
      val plan = df.queryExecution.executedPlan
      // the invariant is about the path STATE SCAN → BUCKET JOIN: the
      // pre-bucketed index must reach its join without an exchange.
      // (Exchanges ABOVE the join move candidate rows — batch-
      // proportional, legitimate; the exact-dedup variant has no
      // post-join agg so its spec can assert the broader form.)
      def hasStateScan(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec
              if f.relation.location.rootPaths.exists(
                _.toString.contains("incr_spec_near_plan")) => f
        }.nonEmpty
      assert(hasStateScan(plan), plan.toString)
      val joins = plan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if hasStateScan(j) => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
            if hasStateScan(j) => j
      }
      assert(joins.nonEmpty, s"no join over the state scan:\n$plan")
      // the innermost such join is the bucket join itself
      val bucketJoin = joins.last
      val stateSide = bucketJoin.children.filter(hasStateScan)
      assert(stateSide.nonEmpty)
      stateSide.foreach { side =>
        val ex = side.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
        }
        assert(ex.isEmpty,
          s"band-index side of the bucket join got exchanged:\n$plan")
      }
      assert(df.count() === batch.count())
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("near classification agrees with the in-memory cross-corpus probe") {
    val table = "incr_spec_near_law"
    val docs = Tables.documents(spark, sf)
    try {
      IncrementalDedup.ensureNearState(docs, "doc_id", "text", table, 8)
      val batch = docs.filter($"doc_id" % 7 === 2)
        .select(($"doc_id" + 5000L).as("doc_id"),
          concat($"text", lit(" tiny suffix")).as("text"))
      val flagged = IncrementalDedup.nearDedupAgainst(spark, table, batch,
          "doc_id", "text")
        .filter($"status" === "near_dup_of_state")
        .select($"doc_id").as[Long].collect().toSet
      // the same decision the one-shot two-sided LSH probe makes
      val expected = Dedup.minhashCandidatesAcross(batch, docs,
          "doc_id", "text")
        .filter($"sig_agreement" >= 0.75)
        .select($"id_a").distinct().as[Long].collect().toSet
      assert(flagged === expected)
      graft.CacheRegistry.releaseAll()
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("appendAccepted: O(batch) state growth, reuse law, probe ≡ rebuild") {
    val table = "incr_spec_append"
    val tableR = "incr_spec_append_ref"
    try {
      IncrementalDedup.ensureState(corpus, "doc_id", "text", table, 4)
      val batch1 = Seq(
        (10L, "nu xi omicron pi"),
        (11L, "alpha beta gamma delta"), // dup of state — NOT kept
        (12L, "rho sigma tau")).toDF("doc_id", "text")
      // MATERIALIZE before the append: kept1's plan reads the state
      // table, and appendAccepted mutates it — a lazy frame would
      // re-classify against the already-appended state on re-eval
      val kept1 = IncrementalDedup.kept(
        IncrementalDedup.dedupAgainst(spark, table, batch1, "doc_id", "text"))
        .select($"doc_id").join(batch1, "doc_id")
        .as[(Long, String)].collect().toSeq.toDF("doc_id", "text")
      IncrementalDedup.appendAccepted(spark, table, kept1,
        "doc_id", "text", 4)
      // REUSE law: the incremental checksum equals the union's
      val union = corpus.unionByName(kept1.select($"doc_id", $"text"))
      assert(!IncrementalDedup.ensureState(union, "doc_id", "text", table, 4),
        "after appendAccepted, ensureState over corpus ∪ kept must reuse")
      // PROBE law: appended state ≡ state rebuilt from the union
      IncrementalDedup.ensureState(union, "doc_id", "text", tableR, 4)
      val batch2 = Seq(
        (20L, "nu  XI omicron pi"),      // dup of appended content
        (21L, "phi chi psi omega"),      // genuinely new
        (22L, "EPSILON zeta eta theta")) // dup of original corpus
        .toDF("doc_id", "text")
      val a = IncrementalDedup.dedupAgainst(spark, table, batch2,
        "doc_id", "text").orderBy("doc_id").collect().toSeq
      val b = IncrementalDedup.dedupAgainst(spark, tableR, batch2,
        "doc_id", "text").orderBy("doc_id").collect().toSeq
      assert(a === b)
      assert(a.map(r => r.getLong(0) -> r.getString(2)).toMap ===
        Map(20L -> "dup_of_state", 21L -> "kept", 22L -> "dup_of_state"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS $tableR")
    }
  }

  test("appendAcceptedNear: band index grows by the batch, probe ≡ rebuild") {
    val table = "incr_spec_append_near"
    val tableR = "incr_spec_append_near_ref"
    try {
      val docs = Seq(
        (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
          "lambda mu nu xi omicron pi")).toDF("doc_id", "text")
      IncrementalDedup.ensureNearState(docs, "doc_id", "text", table, 4)
      val kept1 = Seq(
        (10L, "one two three four five six seven eight nine ten eleven " +
          "twelve thirteen fourteen")).toDF("doc_id", "text")
      IncrementalDedup.appendAcceptedNear(spark, table, kept1,
        "doc_id", "text", 4)
      val union = docs.unionByName(kept1)
      assert(!IncrementalDedup.ensureNearState(union, "doc_id", "text",
        table, 4), "after appendAcceptedNear, ensureNearState must reuse")
      IncrementalDedup.ensureNearState(union, "doc_id", "text", tableR, 4)
      val batch2 = Seq(
        (20L, "one two three four five six seven eight nine ten eleven " +
          "twelve thirteen fourteen tail"),                    // near 10
        (21L, "completely novel content sharing no shingles at all"))
        .toDF("doc_id", "text")
      val a = IncrementalDedup.nearDedupAgainst(spark, table, batch2,
        "doc_id", "text").orderBy("doc_id").collect().toSeq
      val b = IncrementalDedup.nearDedupAgainst(spark, tableR, batch2,
        "doc_id", "text").orderBy("doc_id").collect().toSeq
      assert(a === b)
      assert(a.head.getString(1) === "near_dup_of_state")
      assert(a.head.getLong(2) === 10L,
        "the appended doc must own the near-match")
      assert(a(1).getString(1) === "kept")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS $tableR")
    }
  }

  test("batch-vs-state composition equals one-shot dedup over the union") {
    val table = "incr_spec_law"
    try {
      val batch = Seq(
        (10L, "alpha beta gamma delta"),
        (11L, "nu xi omicron pi"),
        (12L, "nu  XI omicron pi")).toDF("doc_id", "text")
      IncrementalDedup.ensureState(corpus, "doc_id", "text", table, 4)
      val classified = IncrementalDedup.dedupAgainst(spark, table, batch,
        "doc_id", "text")
      // survivors of (state ∪ batch) via the incremental path…
      val incrementalOwners = IncrementalDedup.stateOf(corpus, "doc_id", "text")
        .select($"owner_id").as[Long].collect().toSet ++
        IncrementalDedup.kept(classified).select($"doc_id").as[Long]
          .collect().toSet
      // …must equal the one-shot first-occurrence owners of the union
      val oneShot = IncrementalDedup.stateOf(
        corpus.unionByName(batch), "doc_id", "text")
        .select($"owner_id").as[Long].collect().toSet
      assert(incrementalOwners === oneShot)
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
