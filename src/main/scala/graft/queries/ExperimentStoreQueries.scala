package graft.queries

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.Ann
import graft.text.{Bm25, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus statistics, experiment readouts (CUPED/QTE/KS/power) and
  * persisted-store serving queries (BM25, phrase, sketch, histogram).
  *
  * Part of the [[PipelineQueries]] linear trait chain: each trait
  * extends the previous one, so member initialization order and
  * visibility are IDENTICAL to the former single-object layout (the
  * chain is a file split, not an architecture: everything still
  * composes into the one PipelineQueries object).
  */
private[queries] trait ExperimentStoreQueries extends MultimodalQueries {
  /** Character-level Shannon entropy per document — the
    * compressibility proxy quality signal (base64 blobs and repeated
    * boilerplate sit at the distribution's extremes). One native
    * kernel call per row, pure narrow map; the oracle replays the
    * quantized per-codepoint integer accumulation via an explode —
    * correct at oracle scale, never the engine's shape.
    *
    * Granularity contract with the oracle: DuckDB's
    * `string_split(text, '')` splits per Unicode CODE POINT (verified
    * incl. astral plane: 'a😀b😀' → 4 elements), and the kernel counts
    * code points too (codePointAt + charCount stepping, never UTF-16
    * units) — CharEntropySpec pins the astral-plane case to the
    * hand-computed quantized value so a regression on either side
    * surfaces even though the parquet fixtures are ASCII-dominated.
    */
  def qCharEntropy(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        graft.functions.CharEntropy.char_entropy(col("text")).as("entropy"))

  val qCharEntropySql: String =
    """WITH c AS (SELECT doc_id, u.ch AS ch, count(*) AS c
      |           FROM documents, unnest(string_split(text, '')) AS u(ch)
      |           GROUP BY 1, 2),
      |n AS (SELECT doc_id, cast(sum(c) as bigint) AS n FROM c GROUP BY 1),
      |sl AS (SELECT c.doc_id,
      |         cast(sum(c.c * cast(round(ln(cast(c.c as double) / n.n) * 1000000)
      |           as bigint)) as bigint) AS slp
      |       FROM c JOIN n USING (doc_id) GROUP BY 1)
      |SELECT d.doc_id, d.n_chars,
      |  round(coalesce(-cast(sl.slp as double) / n.n / 1000000, 0.0), 6)
      |    AS entropy
      |FROM documents d
      |LEFT JOIN n USING (doc_id) LEFT JOIN sl USING (doc_id)""".stripMargin

  /** PMI phrase candidates (word2phrase collocations) at min pair
    * count 3 — full surviving-bigram table with exact counts and the
    * 6-dp quantized PMI.
    */
  def qPmiPhrases(s: SparkSession, d: String): DataFrame =
    graft.text.Pmi.phrases(Tables.documents(s, d), "text", minCount = 3)

  val qPmiPhrasesSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |uni AS (SELECT u.tok AS tok, count(*) AS c
       |        FROM t, unnest(toks) AS u(tok) GROUP BY 1),
       |nu AS (SELECT cast(sum(c) as bigint) AS nu FROM uni),
       |nb AS (SELECT cast(sum(greatest(len(toks) - 1, 0)) as bigint) AS nb
       |       FROM t),
       |bg AS (SELECT toks[u.i] AS a, toks[u.i + 1] AS b
       |       FROM t, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)),
       |pc AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY 1, 2
       |       HAVING count(*) >= 3),
       |j AS (SELECT pc.a, pc.b, pc.c_ab, ua.c AS n_a, ub.c AS n_b
       |      FROM pc JOIN uni ua ON pc.a = ua.tok
       |      JOIN uni ub ON pc.b = ub.tok)
       |SELECT j.a || ' ' || j.b AS bigram, j.c_ab AS n_pair, j.n_a, j.n_b,
       |  round(ln((cast(j.c_ab as double) / cast(nb.nb as double)) /
       |    ((cast(j.n_a as double) / cast(nu.nu as double)) *
       |     (cast(j.n_b as double) / cast(nu.nu as double)))), 6) AS pmi
       |FROM j CROSS JOIN nu CROSS JOIN nb""".stripMargin

  /** word2phrase apply: glue the mined PMI ≥ 0.7 phrases back into the
    * corpus's token streams, greedy left-to-right — the vocabulary
    * preprocessing step before BPE/vocab training.
    */
  def qPhraseGlue(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val ph = graft.text.Pmi.phrases(docs, "text", minCount = 3)
      .filter(col("pmi") >= 0.7)
      .select(split(col("bigram"), " ").getItem(0).as("a"),
        split(col("bigram"), " ").getItem(1).as("b"))
    graft.text.Pmi.gluePhrases(docs, "doc_id", "text", ph)
  }

  val qPhraseGlueSql: String =
    s"""WITH pm AS (
       |$qPmiPhrasesSql),
       |ph AS (SELECT string_split(bigram, ' ')[1] AS a,
       |              string_split(bigram, ' ')[2] AS b
       |       FROM pm WHERE pmi >= 0.7),
       |t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |tk AS (SELECT doc_id, u.p - 1 AS p, toks[u.p] AS tok
       |       FROM t, unnest(range(1, len(toks) + 1)) AS u(p)),
       |pr AS (SELECT doc_id, u.i - 1 AS p, toks[u.i] AS a, toks[u.i + 1] AS b
       |       FROM t, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)),
       |m AS (SELECT pr.doc_id, pr.p, pr.a || '_' || pr.b AS glued
       |      FROM pr JOIN ph USING (a, b)),
       |isl AS (SELECT doc_id, p, glued,
       |          p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
       |        FROM m),
       |g AS (SELECT doc_id, p, glued,
       |        row_number() OVER (PARTITION BY doc_id, grp ORDER BY p) AS rn
       |      FROM isl),
       |gl AS (SELECT doc_id, p, glued FROM g WHERE rn % 2 = 1),
       |keep AS (
       |  SELECT tk.doc_id, tk.p, coalesce(gl.glued, tk.tok) AS t2,
       |         (gl2.p IS NOT NULL) AS consumed,
       |         (gl.p IS NOT NULL) AS is_glue
       |  FROM tk
       |  LEFT JOIN gl ON tk.doc_id = gl.doc_id AND tk.p = gl.p
       |  LEFT JOIN gl gl2 ON tk.doc_id = gl2.doc_id AND tk.p = gl2.p + 1),
       |o AS (SELECT doc_id,
       |        string_agg(t2, ' ' ORDER BY p) AS text_glued,
       |        cast(sum(CASE WHEN is_glue THEN 1 ELSE 0 END) as bigint)
       |          AS n_glued
       |      FROM keep WHERE NOT consumed GROUP BY doc_id)
       |SELECT d.doc_id, coalesce(o.text_glued, '') AS text_glued,
       |  coalesce(o.n_glued, cast(0 as bigint)) AS n_glued
       |FROM documents d LEFT JOIN o USING (doc_id)""".stripMargin

  /** Sorted-neighborhood near-duplicate pairs: block by the first 24
    * normalized chars, slide a window of 8 ranks, verify with exact
    * Levenshtein ≤ 60 after the length-difference lower bound. The
    * oracle replays the rank with ONE global row_number — correct at
    * oracle scale; the engine computes the identical rank shard-wise
    * (SortedNeighborhood.rankByOrder), never a global window.
    */
  def qSnmPairs(s: SparkSession, d: String): DataFrame =
    graft.dedup.SortedNeighborhood.pairs(
      Tables.documents(s, d), "doc_id", "text",
      substring(lower(trim(col("text"))), 1, 24),
      window = 8, maxDist = 60)

  val qSnmPairsSql: String =
    """WITH k AS (SELECT doc_id, text,
      |             substr(lower(trim(text)), 1, 24) AS kk FROM documents),
      |r AS (SELECT doc_id, text,
      |        row_number() OVER (ORDER BY kk, doc_id) - 1 AS r FROM k),
      |p AS (SELECT a.doc_id AS lo_id, b.doc_id AS hi_id,
      |        cast(b.r - a.r as bigint) AS gap,
      |        cast(levenshtein(a.text, b.text) as bigint) AS dist
      |      FROM r a JOIN r b ON b.r > a.r AND b.r <= a.r + 8
      |      WHERE abs(length(a.text) - length(b.text)) <= 60)
      |SELECT lo_id, hi_id, gap, dist FROM p WHERE dist <= 60""".stripMargin

  /** CCNet-style perplexity bands: score every document with the
    * corpus-trained unigram LM, then split each LANGUAGE slice into
    * head/middle/tail at its own mean-log-prob terciles (a global cut
    * would label whole low-resource languages "tail"). Thresholds are
    * sketch-quantile estimates — one bounded grouped histogram, never
    * a per-group sort.
    */
  def qPplBands(s: SparkSession, d: String): DataFrame =
    pplBands(Tables.documents(s, d))

  /** Banding body over any (doc_id, lang, text) frame — split out so
    * the empty-document sentinel handling is unit-testable.
    */
  def pplBands(docs: DataFrame): DataFrame = {
    // The scored frame feeds BOTH the per-language threshold estimator
    // and the final banding join — unstaged, the whole UnigramLm pass
    // (vocab count + logp join + per-doc aggregation) re-runs for each
    // consumer, i.e. one extra corpus scoring pass per query (guide
    // §5: cache only when reuse beats recompute — a V-sized
    // (doc_id, lang, n_tokens, avg_logp) frame vs a second LM pass is
    // exactly that trade). Within-query staging only: the cache is
    // registered and released by the per-query CacheRegistry sweep.
    val wl = graft.CacheRegistry.register(
      graft.text.UnigramLm.score(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // token-less docs carry UnigramLm's avg_logp = 0.0 SENTINEL, not a
    // fluency score — with PplHi = 0.0 they would band 'head' and
    // their top-bin mass would inflate every threshold of their
    // language; keep them out of the estimator and pin them to 'tail'
    val scoredOnly = wl.filter(col("n_tokens") > 0)
    val thr = graft.sketch.QuantileHist.quantiles(
        scoredOnly, Seq("lang"), "avg_logp", PplLo, PplHi, PplBins,
        Seq(PplQ1, PplQ2))
      .groupBy(col("lang"))
      .agg(max(when(col("q") === PplQ1, col("est"))).as("__t_lo"),
        max(when(col("q") === PplQ2, col("est"))).as("__t_hi"))
    wl.join(thr, Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("avg_logp"),
        when(col("n_tokens") === 0, "tail")
          .when(col("avg_logp") >= col("__t_hi"), "head")
          .when(col("avg_logp") >= col("__t_lo"), "middle")
          .otherwise("tail").as("band"))
  }

  private[queries] val PplLo = -12.0
  private[queries] val PplHi = 0.0
  private[queries] val PplBins = 96
  private[queries] val PplQ1 = 1.0 / 3
  private[queries] val PplQ2 = 2.0 / 3

  val qPplBandsSql: String = {
    val est = graft.sketch.QuantileHist.quantileOracleSql(
      "so", "lang", "avg_logp", PplLo, PplHi, PplBins, Seq(PplQ1, PplQ2))
    s"""WITH scored AS (
       |$qUnigramLmSql),
       |wl AS (SELECT s.doc_id, d.lang, s.n_tokens, s.avg_logp
       |       FROM scored s JOIN documents d USING (doc_id)),
       |so AS (SELECT * FROM wl WHERE n_tokens > 0),
       |est AS (
       |$est),
       |b AS (SELECT lang,
       |        max(CASE WHEN q = $PplQ1 THEN est END) AS t_lo,
       |        max(CASE WHEN q = $PplQ2 THEN est END) AS t_hi
       |      FROM est GROUP BY 1)
       |SELECT w.doc_id, w.lang, w.avg_logp,
       |  CASE WHEN w.n_tokens = 0 THEN 'tail'
       |       WHEN w.avg_logp >= b.t_hi THEN 'head'
       |       WHEN w.avg_logp >= b.t_lo THEN 'middle'
       |       ELSE 'tail' END AS band
       |FROM wl w LEFT JOIN b USING (lang)""".stripMargin
  }

  /** Directional shingle containment (small doc swallowed by big doc —
    * the asymmetric case Jaccard misses) at C ≥ 0.5 over the df ≤ 64
    * informative-shingle set.
    */
  def qContainment(s: SparkSession, d: String): DataFrame =
    Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
      w = 3, minContain = 0.5, dfCap = 64)

  val qContainmentSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |g AS (SELECT doc_id, ${shinglesSql("toks")} AS gs FROM t),
       |e AS (SELECT doc_id, u.h AS h FROM g, unnest(gs) AS u(h)),
       |dfq AS (SELECT h, count(*) AS df FROM e GROUP BY 1),
       |sv AS (SELECT e.doc_id, e.h, dfq.df
       |       FROM e JOIN dfq USING (h) WHERE dfq.df <= 64),
       |ns AS (SELECT doc_id, count(*) AS n_src FROM sv GROUP BY 1),
       |p AS (SELECT a.doc_id AS src_id, b.doc_id AS dst_id,
       |        count(*) AS shared
       |      FROM sv a JOIN sv b ON a.h = b.h AND a.doc_id <> b.doc_id
       |      WHERE a.df >= 2 GROUP BY 1, 2),
       |c AS (SELECT p.src_id, p.dst_id, p.shared, ns.n_src,
       |        nd.n_src AS n_dst,
       |        round(cast(p.shared as double) / cast(ns.n_src as double), 6)
       |          AS contain
       |      FROM p JOIN ns ON ns.doc_id = p.src_id
       |      JOIN ns nd ON nd.doc_id = p.dst_id)
       |SELECT src_id, dst_id, shared, n_src, n_dst, contain
       |FROM c WHERE contain >= 0.5""".stripMargin

  /** Percentile-rank transform of n_chars within each source — the
    * rank-uniformization feature preprocessing. The per-group
    * percentile comes from ONE range-sharded GLOBAL rank over
    * (source, value, id) minus each source's min rank — groups are
    * contiguous under that order — so the engine never runs the
    * per-source data-sized window the oracle replays.
    */
  def qRankTransform(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val ranked = graft.dedup.SortedNeighborhood.rankByOrder(
      docs, Seq("source", "n_chars", "doc_id"), numShards = 32)
    val base = ranked.groupBy(col("source"))
      .agg(min(col("snm_rank")).as("__r0"), count(lit(1)).as("__n"))
    ranked.join(base, Seq("source"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        round((col("snm_rank") - col("__r0")).cast(DoubleType) /
          greatest(col("__n") - 1L, lit(1L)).cast(DoubleType), 6)
          .as("pct_rank"))
  }

  val qRankTransformSql: String =
    """WITH r AS (SELECT doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) - 1 AS rr,
      |    count(*) OVER (PARTITION BY source) AS n
      |  FROM documents)
      |SELECT doc_id, source, n_chars,
      |  round(cast(rr as double) / cast(greatest(n - 1, 1) as double), 6)
      |    AS pct_rank
      |FROM r""".stripMargin

  /** Curation capstone v5 — the round's new signals composed into one
    * gate: drop the per-language perplexity TAIL band (worst tercile
    * by the corpus-trained LM), scrub docs ≥ 90% contained in another
    * doc (the asymmetric-dup direction: the swallowed copy goes, the
    * host stays), then keep only docs above a character-entropy floor
    * (degenerate/boilerplate text). Per-source survivor counts, exact
    * char volume, and the quantized mean entropy — every stage is the
    * already-verified operator, so the capstone adds composition, not
    * new math.
    */
  def qCurationV5(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val keepBand = qPplBands(s, d)
      .filter(col("band") =!= "tail").select(col("doc_id"))
    // the swallowed copy is the SMALLER side (fewer informative
    // shingles; ties by higher id) — near-identical docs contain each
    // other, and dropping every src would annihilate BOTH copies
    val swallowed = Dedup.containmentPairs(docs, "doc_id", "text",
        w = 3, minContain = 0.9, dfCap = 64)
      .filter(col("n_src") < col("n_dst") ||
        (col("n_src") === col("n_dst") && col("src_id") > col("dst_id")))
      .select(col("src_id").as("doc_id")).distinct()
    docs
      .join(keepBand, Seq("doc_id"))
      .join(swallowed, Seq("doc_id"), "left_anti")
      .withColumn("ent",
        graft.functions.CharEntropy.char_entropy(col("text")))
      .filter(col("ent") >= 2.0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).cast(LongType).as("chars"),
        // entropy is a 6-dp-rounded double; summing its exact 1e6
        // integer image keeps the mean order-independent. round()
        // before the long cast: ent*1e6 lands a float-ulp off the
        // integer, and Spark's cast TRUNCATES where DuckDB's rounds
        round((sum(round(col("ent") * 1e6).cast(LongType)).cast(DoubleType) /
          count(lit(1)) / 1e6), 6).as("mean_ent"))
  }

  // lazy: composes qPplBandsSql/qContainmentSql/qCharEntropySql vals
  lazy val qCurationV5Sql: String =
    s"""WITH bands AS (
       |$qPplBandsSql),
       |cont AS (
       |$qContainmentSql),
       |entq AS (
       |$qCharEntropySql),
       |keep AS (SELECT doc_id FROM bands WHERE band <> 'tail'),
       |sw AS (SELECT DISTINCT src_id AS doc_id FROM cont
       |       WHERE contain >= 0.9
       |         AND (n_src < n_dst
       |              OR (n_src = n_dst AND src_id > dst_id))),
       |kept AS (
       |  SELECT d.source, d.n_chars, e.entropy
       |  FROM documents d
       |  JOIN keep USING (doc_id)
       |  LEFT JOIN sw USING (doc_id)
       |  JOIN entq e USING (doc_id)
       |  WHERE sw.doc_id IS NULL AND e.entropy >= 2.0)
       |SELECT source, count(*) AS n_kept,
       |  cast(sum(n_chars) as bigint) AS chars,
       |  round(cast(sum(cast(round(entropy * 1000000) as bigint)) as double) /
       |    count(*) / 1000000, 6) AS mean_ent
       |FROM kept GROUP BY source""".stripMargin

  /** Sketch re-aggregation — the mergeability law AS a query: HLL
    * registers built per (returnflag, linestatus) max-merge up to
    * returnflag and finalize to the IDENTICAL estimate a direct
    * coarse-grain sketch gives (the defining property that lets a
    * warehouse store fine-grain sketches once and serve every rollup
    * without rescanning). Both paths emitted; the hash pins equality.
    */
  def qHllRollup(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.Hll
    val li = Tables.lineitem(s, d)
    val fine = Hll.registers(li, Seq("l_returnflag", "l_linestatus"),
      "l_partkey")
    val mergedRegs = fine
      .groupBy(col("l_returnflag"), col("reg_idx"))
      .agg(max(col("reg_rank")).as("reg_rank"))
    val merged = Hll.estimateFromRegisters(mergedRegs, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_est").as("n_est_merged"))
    val direct = Hll.estimate(li, Seq("l_returnflag"), "l_partkey")
      .select(col("l_returnflag"), col("n_est").as("n_est_direct"))
    merged.join(direct, Seq("l_returnflag"))
  }

  val qHllRollupSql: String = graft.sketch.Hll.rollupOracleSql(
    "lineitem", Seq("l_returnflag", "l_linestatus"), Seq("l_returnflag"),
    "l_partkey")

  /** KMV trim-after-merge law as a query: fine-grain k-min registers
    * union, dedup, re-trim to k — exactly the direct coarse sketch's
    * estimate. The complementary mergeability identity to
    * [[qHllRollup]]'s register max (min-set vs max-register).
    */
  def qKmvRollup(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.Kmv
    val k = 512
    val li = Tables.lineitem(s, d)
    val merged = Kmv.estimateFromSketch(
        Kmv.registers(li, Seq("l_returnflag", "l_linestatus"), "l_partkey", k)
          .groupBy(col("l_returnflag"))
          .agg(graft.functions.KMinAgg.k_min_distinct(col("h"), k).as("hs")),
        Seq("l_returnflag"), k)
      .select(col("l_returnflag"), col("n_est").as("n_est_merged"))
    val direct = Kmv.estimateDistinct(li, Seq("l_returnflag"), "l_partkey", k)
      .select(col("l_returnflag"), col("n_est").as("n_est_direct"))
    merged.join(direct, Seq("l_returnflag"))
  }

  val qKmvRollupSql: String = graft.sketch.Kmv.rollupOracleSql(
    "lineitem", Seq("l_returnflag", "l_linestatus"), Seq("l_returnflag"),
    "l_partkey", 512)

  /** Per-user EWMA of event values (α = 0.25), seeded with the first
    * value in (ts, event_id) order — the per-entity recurrence family
    * frame windows cannot express.
    */
  def qEwma(s: SparkSession, d: String): DataFrame =
    graft.ops.TimeSeries.ewma(Tables.events(s, d),
      "user_id", "ts", "event_id", "value", alpha = 0.25)

  val qEwmaSql: String =
    """WITH o AS (SELECT user_id,
      |             list(round(cast(value as double) * 1000000)
      |               ORDER BY ts, event_id) AS vs
      |           FROM events GROUP BY 1)
      |SELECT user_id, cast(len(vs) as bigint) AS n_events,
      |  round(list_reduce(vs,
      |    (acc, x) -> round(x * 0.25 + acc * 0.75)) / 1000000, 6) AS ewma
      |FROM o""".stripMargin

  /** CUPED variance-reduced A/B readout over events: users split by
    * user_id parity, pre-period (< 2024-01-16) spend is the covariate,
    * post-period spend the metric; θ = cov(X,Y)/var(X) from POOLED
    * moments, adjusted metric ȳᵥ − θ(x̄ᵥ − x̄), plus the achieved
    * variance-reduction ρ² = cov²/(varX·varY). Numeric discipline:
    * values quantize to integer cents, per-user sums and ALL moment
    * sums accumulate in decimal(38,0) (Spark) ≙ HUGEINT (DuckDB) so
    * every covariance numerator is an EXACT integer in both engines —
    * the only floating-point steps are the final divisions, each a
    * single correctly-rounded cast + round(·,6) replayed
    * operation-for-operation in the oracle. Scale shape: one
    * map-side-combining per-user aggregate, one 7-number global
    * moment row (broadcast), one per-variant aggregate.
    */
  def qCuped(s: SparkSession, d: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val dec = "decimal(38,0)"
    val per = Tables.events(s, d)
      .select(col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("q"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("ts") < cut, col("q")).otherwise(0L)).as("x"),
        sum(when(col("ts") >= cut, col("q")).otherwise(0L)).as("y"))
    val m = per.agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      // cast BEFORE multiplying: long*long wraps silently past 2^63
      // while DuckDB errors — decimal operands keep both paths exact
      sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
      sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
      sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"))
      .select(col("n"), col("sx"), col("sy"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_n"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("varx_n"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("vary_n"))
      .select(col("n"), col("sx"),
        round(col("cov_n").cast("double") / col("varx_n").cast("double"), 6)
          .as("theta"),
        round(col("cov_n").cast("double") * col("cov_n").cast("double") /
          (col("varx_n").cast("double") * col("vary_n").cast("double")), 6)
          .as("var_reduction"))
    per.withColumn("variant", (col("user_id") % 2).cast("long"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x").cast(dec)).as("sxv"),
        sum(col("y").cast(dec)).as("syv"))
      .crossJoin(broadcast(m))
      .select(col("variant"), col("n_users"),
        round(col("sxv").cast("double") /
          (col("n_users").cast("double") * 100.0), 6).as("mean_pre"),
        round(col("syv").cast("double") /
          (col("n_users").cast("double") * 100.0), 6).as("mean_post"),
        col("theta"),
        round((col("syv").cast("double") / col("n_users").cast("double") -
          col("theta") * (col("sxv").cast("double") /
            col("n_users").cast("double") -
            col("sx").cast("double") / col("n").cast("double"))) / 100.0, 6)
          .as("mean_post_adj"),
        col("var_reduction"))
  }

  val qCupedSql: String =
    """WITH per AS (
      |  SELECT user_id,
      |    sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
      |        THEN CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)
      |        ELSE 0 END) AS x,
      |    sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
      |        THEN CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)
      |        ELSE 0 END) AS y
      |  FROM events GROUP BY 1),
      |m0 AS (
      |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      |  FROM per),
      |m AS (
      |  SELECT n, sx,
      |    round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |      CAST(n * sxx - sx * sx AS DOUBLE), 6) AS theta,
      |    round(CAST(n * sxy - sx * sy AS DOUBLE) *
      |      CAST(n * sxy - sx * sy AS DOUBLE) /
      |      (CAST(n * sxx - sx * sx AS DOUBLE) *
      |       CAST(n * syy - sy * sy AS DOUBLE)), 6) AS var_reduction
      |  FROM m0),
      |v AS (
      |  SELECT CAST(user_id % 2 AS BIGINT) AS variant,
      |    count(*) AS n_users, sum(x) AS sxv, sum(y) AS syv
      |  FROM per GROUP BY 1)
      |SELECT variant, n_users,
      |  round(CAST(sxv AS DOUBLE) / (CAST(n_users AS DOUBLE) * 100.0), 6)
      |    AS mean_pre,
      |  round(CAST(syv AS DOUBLE) / (CAST(n_users AS DOUBLE) * 100.0), 6)
      |    AS mean_post,
      |  m.theta,
      |  round((CAST(syv AS DOUBLE) / CAST(n_users AS DOUBLE) -
      |    m.theta * (CAST(sxv AS DOUBLE) / CAST(n_users AS DOUBLE) -
      |      CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE))) / 100.0, 6)
      |    AS mean_post_adj,
      |  m.var_reduction
      |FROM v CROSS JOIN m""".stripMargin

  /** Incremental view maintenance of a join view by delta algebra:
    * with A = orders and B = lineitem each split into old/delta on a
    * key hash (ΔA: o_orderkey ≡ 0 mod 7; ΔB: l_orderkey ≡ 0 mod 5 —
    * deliberately different moduli so all three delta-join terms are
    * non-empty), ΔV = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB. The query folds ΔV's per-priority
    * aggregate into V₀'s and emits it side-by-side with the full
    * recompute plus a match flag — the correctness law OF the
    * maintenance algebra, verified row-by-row by the oracle. Scale
    * shape: each delta join is delta-sized on at least one side (the
    * whole point of IVM — maintenance cost tracks the batch, not the
    * base), aggregates are map-side-combined integers (revenue in
    * cents), and the old/delta splits are pushed-down parquet filters.
    */
  def qIvmJoin(s: SparkSession, d: String): DataFrame = {
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val a = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val b = Tables.lineitem(s, d)
      .select(col("l_orderkey"), cents.as("cents"))
    val aOld = a.filter(col("o_orderkey") % 7 =!= 0)
    val aDel = a.filter(col("o_orderkey") % 7 === 0)
    val bOld = b.filter(col("l_orderkey") % 5 =!= 0)
    val bDel = b.filter(col("l_orderkey") % 5 === 0)
    def agg(df: DataFrame): DataFrame =
      df.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("rows_"), sum(col("cents")).as("rev"))
    def j(x: DataFrame, y: DataFrame): DataFrame =
      x.join(y, x("o_orderkey") === y("l_orderkey"))
    val v0 = agg(j(aOld, bOld))
    val dv = agg(j(aDel, bOld)
      .unionByName(j(aOld, bDel))
      .unionByName(j(aDel, bDel)))
    val incr = v0.select(col("o_orderpriority"), col("rows_"), col("rev"))
      .unionByName(dv)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("rows_")).as("rows_incr"), sum(col("rev")).as("rev_incr"))
    val full = agg(j(a, b))
      .select(col("o_orderpriority"), col("rows_").as("rows_full"),
        col("rev").as("rev_full"))
    incr.join(full, Seq("o_orderpriority"))
      .select(col("o_orderpriority"),
        col("rows_incr"), col("rows_full"),
        col("rev_incr"), col("rev_full"),
        (col("rows_incr") === col("rows_full") &&
          col("rev_incr") === col("rev_full")).as("consistent"))
  }

  val qIvmJoinSql: String =
    """WITH a AS (SELECT o_orderkey, o_orderpriority FROM orders),
      |b AS (SELECT l_orderkey,
      |        CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT)
      |          AS cents
      |      FROM lineitem),
      |a_old AS (SELECT * FROM a WHERE o_orderkey % 7 <> 0),
      |a_del AS (SELECT * FROM a WHERE o_orderkey % 7 = 0),
      |b_old AS (SELECT * FROM b WHERE l_orderkey % 5 <> 0),
      |b_del AS (SELECT * FROM b WHERE l_orderkey % 5 = 0),
      |v0 AS (SELECT o_orderpriority, count(*) AS rows_, sum(cents) AS rev
      |       FROM a_old JOIN b_old ON o_orderkey = l_orderkey GROUP BY 1),
      |dv AS (SELECT o_orderpriority, count(*) AS rows_, sum(cents) AS rev
      |       FROM (
      |         SELECT o_orderpriority, cents
      |         FROM a_del JOIN b_old ON o_orderkey = l_orderkey
      |         UNION ALL
      |         SELECT o_orderpriority, cents
      |         FROM a_old JOIN b_del ON o_orderkey = l_orderkey
      |         UNION ALL
      |         SELECT o_orderpriority, cents
      |         FROM a_del JOIN b_del ON o_orderkey = l_orderkey)
      |       GROUP BY 1),
      |incr AS (
      |  SELECT o_orderpriority, sum(rows_) AS rows_incr, sum(rev) AS rev_incr
      |  FROM (SELECT * FROM v0 UNION ALL SELECT * FROM dv) GROUP BY 1),
      |fullv AS (
      |  SELECT o_orderpriority, count(*) AS rows_full, sum(cents) AS rev_full
      |  FROM a JOIN b ON o_orderkey = l_orderkey GROUP BY 1)
      |SELECT o_orderpriority,
      |  CAST(rows_incr AS BIGINT) AS rows_incr, rows_full,
      |  CAST(rev_incr AS BIGINT) AS rev_incr,
      |  CAST(rev_full AS BIGINT) AS rev_full,
      |  (rows_incr = rows_full AND rev_incr = rev_full) AS consistent
      |FROM incr JOIN fullv USING (o_orderpriority)""".stripMargin

  /** KMV theta-sketch set intersection: "how much does corpus A
    * overlap corpus B" answered from two 512-register sketches
    * (graft.sketch.Kmv.jaccardEstimate) instead of a raw-data join —
    * THE set-operation payoff that distinguishes KMV from HLL. Sides:
    * the (part, supplier) pairs shipped with returnflag R vs A
    * (~5% true Jaccard). The exact full-join answer rides along so
    * the verified artifact MEASURES estimator error instead of
    * claiming it; the serving path at 100 TB is the sketch-only
    * prefix (two ≤512-row register sets joined on hash — the exact
    * branch is the expensive thing the sketch exists to avoid).
    * Deterministic: registers are integer hashes, θ-truncated set
    * arithmetic is integer, and the estimates are fixed-order double
    * expressions replayed verbatim in the oracle.
    */
  def qKmvIntersect(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.Kmv
    val li = Tables.lineitem(s, d)
      .select((col("l_partkey") * 1000000L + col("l_suppkey")).as("v"),
        col("l_returnflag"))
    val a = li.filter(col("l_returnflag") === "R").select(col("v"))
    val b = li.filter(col("l_returnflag") === "A").select(col("v"))
    val est = Kmv.jaccardEstimate(a, b, "v", k = 512)
    val exact = a.distinct().select(col("v"), lit(true).as("in_a"))
      .join(b.distinct().select(col("v"), lit(true).as("in_b")),
        Seq("v"), "full_outer")
      .agg(
        sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("in_b"), 1L).otherwise(0L)).as("n_b"),
        sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L))
          .as("exact_inter"),
        count(lit(1)).as("exact_union"))
    exact.crossJoin(broadcast(est)).select(
      col("n_a"), col("n_b"), col("exact_inter"), col("exact_union"),
      round(col("exact_inter").cast("double") /
        col("exact_union").cast("double"), 6).as("exact_jaccard"),
      round(col("est_jaccard"), 6).as("est_jaccard"),
      round(col("est_intersection"), 6).as("est_intersection"))
  }

  val qKmvIntersectSql: String = {
    val k = 512
    val h = "cast(('0x' || substr(md5(cast(v as varchar)), 1, 15)) as bigint)"
    s"""WITH src AS (SELECT l_partkey * 1000000 + l_suppkey AS v, l_returnflag
       |             FROM lineitem),
       |da AS (SELECT DISTINCT v FROM src WHERE l_returnflag = 'R'),
       |db AS (SELECT DISTINCT v FROM src WHERE l_returnflag = 'A'),
       |ra AS (SELECT h FROM (
       |  SELECT $h AS h, row_number() OVER (ORDER BY $h ASC) AS rn
       |  FROM da) WHERE rn <= $k),
       |rb AS (SELECT h FROM (
       |  SELECT $h AS h, row_number() OVER (ORDER BY $h ASC) AS rn
       |  FROM db) WHERE rn <= $k),
       |th AS (SELECT least((SELECT max(h) FROM ra),
       |                    (SELECT max(h) FROM rb)) AS theta),
       |j AS (SELECT coalesce(ra.h, rb.h) AS h,
       |        ra.h IS NOT NULL AS in_a, rb.h IS NOT NULL AS in_b
       |      FROM ra FULL OUTER JOIN rb ON ra.h = rb.h),
       |e0 AS (SELECT
       |         sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS n_inter,
       |         count(*) AS n_union, max(theta) AS theta
       |       FROM j, th WHERE h <= theta),
       |e AS (SELECT
       |        CASE WHEN n_union > 0
       |          THEN CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE)
       |          ELSE 0.0 END AS ej,
       |        n_union, theta
       |      FROM e0),
       |est AS (SELECT round(ej, 6) AS est_jaccard,
       |          round(ej * (greatest(CAST(n_union AS DOUBLE) - 1.0, 0.0) /
       |            (CAST(theta AS DOUBLE) / 1152921504606846976.0)), 6)
       |            AS est_intersection
       |        FROM e),
       |ex AS (SELECT
       |         CAST(sum(CASE WHEN da.v IS NOT NULL THEN 1 ELSE 0 END)
       |           AS BIGINT) AS n_a,
       |         CAST(sum(CASE WHEN db.v IS NOT NULL THEN 1 ELSE 0 END)
       |           AS BIGINT) AS n_b,
       |         CAST(sum(CASE WHEN da.v IS NOT NULL AND db.v IS NOT NULL
       |           THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter,
       |         count(*) AS exact_union
       |       FROM da FULL OUTER JOIN db ON da.v = db.v)
       |SELECT n_a, n_b, exact_inter, exact_union,
       |  round(CAST(exact_inter AS DOUBLE) / CAST(exact_union AS DOUBLE), 6)
       |    AS exact_jaccard,
       |  est_jaccard, est_intersection
       |FROM ex CROSS JOIN est""".stripMargin
  }

  /** Positional phrase search: mine the corpus's most frequent bigram
    * (deterministic tie-break), then find every document containing
    * that two-token phrase with occurrence count and first position —
    * the adjacency-aware retrieval primitive a bag-of-words index
    * (q_bm25) cannot answer, and the batch twin of the
    * positions-column extension a persisted inverted index needs for
    * phrase queries. Scale shape: bigrams come from a doc-partitioned
    * lead() window (never a global sort), the argmax bigram is a
    * TakeOrdered(1) over grouped counts, and the occurrence scan is
    * one broadcast-semi-join of the token stream against a 1-row
    * phrase table.
    */
  def qPhraseSearch(s: SparkSession, d: String): DataFrame = {
    val toks = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(Tables.documents(s, d))
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = toks
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("tok").as("w1"), lead(col("tok"), 1).over(w).as("w2"))
      .filter(col("w2").isNotNull)
    val top = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w1").asc, col("w2").asc)
      .limit(1)
      .select(col("w1"), col("w2"))
    bigrams.join(broadcast(top), Seq("w1", "w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_occ"), min(col("pos")).as("first_pos"))
      .select(col("doc_id"), col("w1"), col("w2"), col("n_occ"),
        col("first_pos"))
  }

  val qPhraseSearchSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |u AS (SELECT doc_id, CAST(r.i - 1 AS BIGINT) AS pos, toks[r.i] AS tok
       |      FROM t, unnest(range(1, len(toks) + 1)) AS r(i)),
       |b AS (SELECT doc_id, pos, tok AS w1,
       |        lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
       |      FROM u),
       |bn AS (SELECT * FROM b WHERE w2 IS NOT NULL),
       |top AS (SELECT w1, w2 FROM (
       |  SELECT w1, w2, count(*) AS c FROM bn GROUP BY 1, 2)
       |  ORDER BY c DESC, w1 ASC, w2 ASC LIMIT 1)
       |SELECT bn.doc_id, bn.w1, bn.w2, count(*) AS n_occ,
       |  min(bn.pos) AS first_pos
       |FROM bn JOIN top ON bn.w1 = top.w1 AND bn.w2 = top.w2
       |GROUP BY 1, 2, 3""".stripMargin

  /** q_phrase_search served FROM the persisted POSITIONAL index
    * (graft.text.PhraseIndex): the (tok, id, pos) postings persist
    * once term-bucketed, the top bigram comes off the index's
    * adjacency self-join, and the phrase probe scans only the two
    * queried terms' buckets (driver-side 1-row phrase pick — the
    * AnnIndex cell-pick discipline). Same oracle as q_phrase_search
    * BY DESIGN: the persisted probe must reproduce the in-query
    * batch scan bit-for-bit.
    */
  def qPhrasePersisted(s: SparkSession, d: String): DataFrame = {
    import graft.text.PhraseIndex
    val table = "graft_phrase_idx_" + d.replaceAll("[^A-Za-z0-9]", "_")
    PhraseIndex.ensure(Tables.documents(s, d), "doc_id", "text", table, 8)
    val top = PhraseIndex.topBigram(s, table).collect().head
    PhraseIndex.phraseOccurrences(s, table,
      top.getString(0), top.getString(1))
  }

  /** Linear multi-touch attribution: every purchase's value is split
    * equally across the user's touch events (any non-purchase type)
    * in the preceding 7 days; touchless purchases credit a synthetic
    * 'direct' channel. The credit unit is an INTEGER micro-cent-share
    * (round(cents·10⁶ / n_touches)) so per-channel totals are exact
    * integer sums — no float accumulation anywhere — with one final
    * division to dollars. Scale shape: the conversion↔touch interval
    * join is keyed by user (per-user event counts are bounded, so the
    * pair blowup is per-key quadratic in a SMALL key group, the same
    * argument as q_interval_join), and both credit aggregations are
    * map-side-combined integer sums.
    */
  def qAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), round(col("value") * 100).cast("long").as("cents"))
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("cts"),
        col("event_id").as("cid"), col("cents"))
    val touch = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts").as("tts"),
        col("event_type").as("channel"))
    val pairs = graft.CacheRegistry.register(
      conv.join(touch, Seq("user_id"))
        .filter(col("tts") < col("cts") &&
          col("tts") >= col("cts") - expr("INTERVAL 7 DAYS"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = pairs.groupBy(col("cid")).agg(count(lit(1)).as("n"))
    val credited = pairs.groupBy(col("cid"), col("cents"), col("channel"))
      .agg(count(lit(1)).as("cnt"))
      .join(n, Seq("cid"))
      .select(col("cid"), col("channel"),
        (col("cnt") * round(col("cents").cast("double") * 1000000.0 /
          col("n").cast("double")).cast("long")).as("micro"))
    val direct = conv.join(pairs.select(col("cid")).distinct(),
        Seq("cid"), "left_anti")
      .select(col("cid"), lit("direct").as("channel"),
        (col("cents") * 1000000L).as("micro"))
    credited.unionByName(direct)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        sum(col("micro")).as("micro_total"))
      .select(col("channel"), col("n_conversions"),
        round(col("micro_total").cast("double") / 100000000.0, 6)
          .as("credit_dollars"))
  }

  val qAttributionSql: String =
    """WITH ev AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents
      |  FROM events),
      |conv AS (SELECT user_id, ts AS cts, event_id AS cid, cents
      |         FROM ev WHERE event_type = 'purchase'),
      |touch AS (SELECT user_id, ts AS tts, event_type AS channel
      |          FROM ev WHERE event_type <> 'purchase'),
      |pairs AS (
      |  SELECT c.cid, c.cents, t.channel
      |  FROM conv c JOIN touch t ON c.user_id = t.user_id
      |    AND t.tts < c.cts AND t.tts >= c.cts - INTERVAL 7 DAY),
      |n AS (SELECT cid, count(*) AS n FROM pairs GROUP BY 1),
      |credited AS (
      |  SELECT p.cid, p.channel,
      |    cnt * CAST(round(CAST(p.cents AS DOUBLE) * 1000000.0 /
      |      CAST(n.n AS DOUBLE)) AS BIGINT) AS micro
      |  FROM (SELECT cid, cents, channel, count(*) AS cnt
      |        FROM pairs GROUP BY 1, 2, 3) p
      |  JOIN n ON p.cid = n.cid),
      |direct AS (
      |  SELECT cid, 'direct' AS channel, cents * 1000000 AS micro
      |  FROM conv WHERE cid NOT IN (SELECT cid FROM pairs))
      |SELECT channel, count(*) AS n_conversions,
      |  round(CAST(sum(micro) AS DOUBLE) / 100000000.0, 6)
      |    AS credit_dollars
      |FROM (SELECT * FROM credited UNION ALL SELECT * FROM direct)
      |GROUP BY 1""".stripMargin

  /** Per-document tf-idf keyword extraction (top 3 terms): the
    * lightweight doc-summarization/topical-tagging pass a curation
    * pipeline runs to label corpus slices before mixing. Same numeric
    * discipline as q_bm25: each term's score quantizes to an integer
    * (round(tf · ln(1 + N/df) · 10⁶)) BEFORE ranking, so the per-doc
    * rank order is integer-total-ordered and replays exactly. Scale
    * shape: tf/df are map-side-combined aggregates over the token
    * stream, the df frame joins broadcast-side (vocab-sized), and the
    * ranking window partitions by doc — never a global sort.
    */
  def qKeywords(s: SparkSession, d: String): DataFrame = {
    val toks = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(Tables.documents(s, d))
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = toks.agg(countDistinct(col("doc_id")).as("n_docs"))
    val scored = tf.join(dfreq, Seq("tok")).crossJoin(broadcast(nDocs))
      .withColumn("score_q",
        round(col("tf").cast("double") *
          log(lit(1.0) + col("n_docs").cast("double") /
            col("df").cast("double")) * 1000000.0).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score_q").desc, col("tok").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("tok").as("term"), col("tf"), col("df"),
        round(col("score_q").cast("double") / 1000000.0, 6).as("score"),
        col("rank"))
  }

  val qKeywordsSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
       |sc AS (
       |  SELECT doc_id, tok, tf, df,
       |    CAST(round(CAST(tf AS DOUBLE) *
       |      ln(1.0 + CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) *
       |      1000000.0) AS BIGINT) AS score_q
       |  FROM tf JOIN dfq USING (tok) CROSS JOIN nd),
       |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
       |        ORDER BY score_q DESC, tok ASC) AS rank FROM sc)
       |SELECT doc_id, tok AS term, tf, df,
       |  round(CAST(score_q AS DOUBLE) / 1000000.0, 6) AS score, rank
       |FROM r WHERE rank <= 3""".stripMargin

  /** First-order Markov transition matrix over per-user event
    * journeys: P(next type | type) from (ts, event_id)-ordered
    * sequences — the behavioral fingerprint that feeds
    * journey-anomaly detection and synthetic-journey generation, and
    * the batch twin of a streaming sessionizer's edge counts. All
    * counts integer (lead over a user-partitioned window, never a
    * global sort); the probability is one final round(·,6) division.
    */
  def qMarkov(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val totals = trans.groupBy(col("from_type"))
      .agg(sum(col("n_trans")).as("n_from"))
    trans.join(totals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n_trans"),
        col("n_from"),
        round(col("n_trans").cast("double") / col("n_from").cast("double"), 6)
          .as("prob"))
  }

  val qMarkovSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |tr AS (SELECT from_type, to_type, count(*) AS n_trans
      |       FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |tot AS (SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS n_from
      |        FROM tr GROUP BY 1)
      |SELECT from_type, to_type, n_trans, n_from,
      |  round(CAST(n_trans AS DOUBLE) / CAST(n_from AS DOUBLE), 6) AS prob
      |FROM tr JOIN tot USING (from_type)""".stripMargin

  /** HLL inclusion–exclusion intersection over the SAME two sets as
    * q_kmv_intersect (part-supp pairs, returnflag R vs A), so the
    * verified artifacts measure the two sketches' intersection error
    * side by side: HLL unions losslessly (register max) but
    * intersects only by est_A + est_B − est_union — signed error that
    * grows as the overlap shrinks — while KMV intersects natively.
    * The Spark path answers all three estimates from ONE register
    * table (sketch once, serve per-side and merged), leaning on the
    * max-merge = union-sketch identity that q_hll_rollup pins; the
    * oracle computes the union sketch directly — equal by that exact
    * integer identity. Exact answer rides along for the error
    * measurement.
    */
  def qHllIntersect(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.Hll
    val li = Tables.lineitem(s, d)
      .filter(col("l_returnflag").isin("R", "A"))
      .select(
        when(col("l_returnflag") === "R", "a").otherwise("b").as("g"),
        (col("l_partkey") * 1000000L + col("l_suppkey")).as("v"))
    val regs = graft.CacheRegistry.register(
      Hll.registers(li, Seq("g"), "v")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val per = Hll.estimateFromRegisters(regs, Seq("g"))
      .groupBy()
      .agg(max(when(col("g") === "a", col("n_est"))).as("ea"),
        max(when(col("g") === "b", col("n_est"))).as("eb"))
    val merged = regs.groupBy(col("reg_idx"))
      .agg(max(col("reg_rank")).as("reg_rank"))
      .withColumn("one", lit(1))
    val un = Hll.estimateFromRegisters(merged, Seq("one"))
      .select(col("n_est").as("eu"))
    val exact = li.filter(col("g") === "a").select(col("v")).distinct()
      .select(col("v"), lit(true).as("in_a"))
      .join(li.filter(col("g") === "b").select(col("v")).distinct()
        .select(col("v"), lit(true).as("in_b")), Seq("v"), "full_outer")
      .agg(sum(when(col("in_a") && col("in_b"), 1L).otherwise(0L))
        .as("exact_inter"))
    per.crossJoin(broadcast(un)).crossJoin(broadcast(exact))
      .select(
        round(col("ea"), 6).as("est_a"),
        round(col("eb"), 6).as("est_b"),
        round(col("eu"), 6).as("est_union"),
        round(col("ea") + col("eb") - col("eu"), 6).as("est_inter"),
        col("exact_inter"))
  }

  val qHllIntersectSql: String = {
    val src = "(SELECT CASE WHEN l_returnflag = 'R' THEN 'a' ELSE 'b' END " +
      "AS g, l_partkey * 1000000 + l_suppkey AS v FROM lineitem " +
      "WHERE l_returnflag IN ('R', 'A'))"
    val srcAll = "(SELECT 1 AS one, l_partkey * 1000000 + l_suppkey AS v " +
      "FROM lineitem WHERE l_returnflag IN ('R', 'A'))"
    val per = graft.sketch.Hll.oracleSql(src, Seq("g"), "v")
    val un = graft.sketch.Hll.oracleSql(srcAll, Seq("one"), "v")
    s"""WITH per AS (
       |$per),
       |un AS (
       |$un),
       |p AS (SELECT max(CASE WHEN g = 'a' THEN n_est END) AS ea,
       |        max(CASE WHEN g = 'b' THEN n_est END) AS eb
       |      FROM per),
       |ex AS (
       |  SELECT CAST(sum(CASE WHEN da.v IS NOT NULL AND db.v IS NOT NULL
       |    THEN 1 ELSE 0 END) AS BIGINT) AS exact_inter
       |  FROM (SELECT DISTINCT l_partkey * 1000000 + l_suppkey AS v
       |        FROM lineitem WHERE l_returnflag = 'R') da
       |  FULL OUTER JOIN
       |       (SELECT DISTINCT l_partkey * 1000000 + l_suppkey AS v
       |        FROM lineitem WHERE l_returnflag = 'A') db
       |  ON da.v = db.v)
       |SELECT round(ea, 6) AS est_a, round(eb, 6) AS est_b,
       |  round(un.n_est, 6) AS est_union,
       |  round(ea + eb - un.n_est, 6) AS est_inter, exact_inter
       |FROM p CROSS JOIN un CROSS JOIN ex""".stripMargin
  }

  /** Cardinality serving from the PERSISTED sketch store
    * (graft.sketch.SketchStore): daily-grain KMV sketches of distinct
    * users per event type persist once (bucketed by event type,
    * staleness-fingerprinted), and the per-type rollup is answered
    * from the stored registers — the raw events are never rescanned
    * at serve time. The direct raw-data estimate rides along; the two
    * are EQUAL by the trim-after-merge identity (q_kmv_rollup), and
    * the oracle recomputes both paths from raw data in DuckDB. This
    * is the 100 TB shape: sketch 30 days once, answer any window's
    * distinct-user question from k-row register sets.
    */
  def qKmvStore(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.{Kmv, SketchStore}
    val k = 256
    val fine = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("user_id"), col("event_id"))
    val table = "graft_kmv_store_" + d.replaceAll("[^A-Za-z0-9]", "_")
    SketchStore.ensure(fine, Seq("event_type", "day"), "user_id", k,
      table, nBuckets = 4, fpIdCol = "event_id")
    val served = SketchStore.serveRollup(s, table, Seq("event_type"), k)
      .select(col("event_type"), col("n_est").as("n_est_served"))
    val direct = Kmv.estimateDistinct(fine, Seq("event_type"), "user_id", k)
      .select(col("event_type"), col("n_est").as("n_est_direct"))
    served.join(direct, Seq("event_type"))
  }

  val qKmvStoreSql: String = graft.sketch.Kmv.rollupOracleSql(
    "(SELECT event_type, CAST(ts AS DATE) AS day, user_id FROM events)",
    Seq("event_type", "day"), Seq("event_type"), "user_id", 256)
    .replace("n_est_merged", "n_est_served")

  /** Quantile serving from the PERSISTED histogram store — the
    * percentile sibling of q_kmv_store: daily-grain fixed-grid value
    * histograms per event type persist once
    * (graft.sketch.SketchStore.ensureHist), and any coarser window's
    * p50/p95 is answered by an exact integer counter merge (≤ nBins
    * rows per group) plus the shared estimator tail — bit-equal to
    * sketching the rollup directly, so the raw-data DuckDB oracle
    * checks the SERVED numbers. The direct estimate rides along.
    */
  def qQhistStore(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.{QuantileHist, SketchStore}
    val (lo, hi, nBins) = (0.0, 256.0, 128)
    val qs = Seq(0.5, 0.95)
    val fine = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("value"), col("event_id"))
    val table = "graft_qhist_store_" + d.replaceAll("[^A-Za-z0-9]", "_")
    SketchStore.ensureHist(fine, Seq("event_type", "day"), "value",
      lo, hi, nBins, table, nBuckets = 4, fpIdCol = "event_id")
    val served = SketchStore.serveHistQuantiles(s, table,
        Seq("event_type"), lo, hi, nBins, qs)
      .select(col("event_type"), col("q"), col("est").as("est_served"))
    val direct = QuantileHist.quantiles(fine, Seq("event_type"), "value",
        lo, hi, nBins, qs)
      .select(col("event_type"), col("q"), col("est").as("est_direct"))
    served.join(direct, Seq("event_type", "q"))
  }

  val qQhistStoreSql: String = {
    val inner = graft.sketch.QuantileHist.quantileOracleSql(
      "events", "event_type", "value",
      lo = 0.0, hi = 256.0, nBins = 128, qs = Seq(0.5, 0.95))
    s"""SELECT event_type, q, est AS est_served, est AS est_direct
       |FROM ($inner)""".stripMargin
  }

  /** Top-10 three-step journeys (event-type trigrams over per-user
    * (ts, event_id)-ordered sequences) — the sequential-pattern
    * counterpart of q_markov's first-order matrix: where the matrix
    * sees edges, this sees paths, the thing funnel design and
    * journey-anomaly work actually consume. Scale shape: trigrams
    * from two leads over the user-partitioned window, counts
    * map-side-combined, and the global top-10 is a TakeOrdered over
    * the grouped counts with a total tie-break — never a global sort
    * of the raw sequence stream.
    */
  def qJourneys(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("s1"))
      .withColumn("s2", lead(col("s1"), 1).over(w))
      .withColumn("s3", lead(col("s1"), 2).over(w))
      .filter(col("s3").isNotNull)
      .groupBy(col("s1"), col("s2"), col("s3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("s1").asc, col("s2").asc, col("s3").asc)
      .limit(10)
  }

  val qJourneysSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type AS s1,
      |    lead(event_type, 1) OVER w AS s2,
      |    lead(event_type, 2) OVER w AS s3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT s1, s2, s3, count(*) AS n
      |FROM seq WHERE s3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, s1 ASC, s2 ASC, s3 ASC LIMIT 10""".stripMargin

  /** Weekly-cohort LTV matrix: users cohorted by first-activity week,
    * purchase revenue accumulated per (cohort, week-index) cell with
    * cohort size and exact integer cents — the standard retention/
    * monetization readout, and the aggregation every mixing decision
    * about "which acquisition slice earns its tokens" mirrors. Scale
    * shape: first-activity is a per-user min (map-side combined, no
    * window), the cohort join broadcasts (one row per user), and the
    * matrix is one integer aggregation; rev_per_user is the only
    * division, rounded once.
    */
  def qCohortLtv(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"),
        floor(datediff(to_date(col("ts")), lit("2024-01-01")) / 7)
          .as("week"))
    val cohort = ev.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val sizes = cohort.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_users"))
    ev.filter(col("event_type") === "purchase")
      .join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week"))
        .as("week_idx"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("rev_cents"))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_idx"), col("n_users"),
        col("n_purchases"), col("rev_cents"),
        round(col("rev_cents").cast("double") /
          (col("n_users").cast("double") * 100.0), 6).as("rev_per_user"))
  }

  val qCohortLtvSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type,
      |    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents,
      |    CAST(floor(date_diff('day', DATE '2024-01-01',
      |      CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week
      |  FROM events),
      |cohort AS (SELECT user_id, min(week) AS cohort_week
      |           FROM ev GROUP BY 1),
      |sizes AS (SELECT cohort_week, count(*) AS n_users
      |          FROM cohort GROUP BY 1),
      |cells AS (
      |  SELECT c.cohort_week, e.week - c.cohort_week AS week_idx,
      |    count(*) AS n_purchases,
      |    CAST(sum(e.cents) AS BIGINT) AS rev_cents
      |  FROM ev e JOIN cohort c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase'
      |  GROUP BY 1, 2)
      |SELECT cohort_week, week_idx, n_users, n_purchases, rev_cents,
      |  round(CAST(rev_cents AS DOUBLE) /
      |    (CAST(n_users AS DOUBLE) * 100.0), 6) AS rev_per_user
      |FROM cells JOIN sizes USING (cohort_week)""".stripMargin

  /** Hard-negative mining for retrieval/contrastive training: for
    * each query vector, the top-5 HIGHEST-cosine candidates whose
    * label DIFFERS — the near-miss negatives that actually teach a
    * bi-encoder, mined exactly as q_ann_topk ranks positives but with
    * the label disagreement filter applied before ranking. Scale
    * shape: identical to the brute-force baseline (broadcast query
    * side, per-query window) — and at corpus scale the same label
    * filter drops into the IVF/PQ candidate path unchanged, since it
    * is a per-candidate predicate, not a ranking change.
    */
  def qHardNegatives(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        Ann.norm(col("embedding")).as("qn"), col("label").as("query_label"))
    val c = graft.ops.Parallelism.widen(emb)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("cvec"),
        Ann.norm(col("embedding")).as("cn"), col("label").as("neg_label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("neg_label") =!= col("query_label"))
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neg_label"),
        Ann.cosinePre(Ann.dot(col("qvec"), col("cvec")),
          col("qn"), col("cn")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .withColumn("sim", round(col("sim"), 6))
  }

  val qHardNegativesSql: String =
    s"""WITH sims AS (
       |  SELECT q.vec_id AS query_id, q.label AS query_label,
       |    c.vec_id AS neighbor_id, c.label AS neg_label,
       |    ${cosSql("q.embedding", "c.embedding")} AS sim
       |  FROM embeddings q JOIN embeddings c ON c.label <> q.label
       |  WHERE q.vec_id < 8),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |        ORDER BY sim DESC, neighbor_id ASC) AS rank FROM sims)
       |SELECT query_id, query_label, neighbor_id, neg_label,
       |  round(sim, 6) AS sim, rank
       |FROM r WHERE rank <= 5""".stripMargin

  /** Per-dimension standardization (whitening stats) of the embedding
    * column: dimension means/stds from EXACT integer moments
    * (values quantized to micro-units, decimal(38,0) ≙ HUGEINT moment
    * sums — the q_cuped discipline applied per dimension) and the
    * z-scored sample for the probe vectors. The preprocessing every
    * distance-based downstream (k-means, PQ, cosine) assumes; at
    * corpus scale it is one posexplode aggregation (64 groups) plus a
    * broadcast join of the 64-row stats table back onto the vectors.
    * Zero-variance dimensions z to 0 by definition in both engines.
    */
  def qEmbedNorm(s: SparkSession, d: String): DataFrame = {
    val dec = "decimal(38,0)"
    val x = graft.CacheRegistry.register(
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          posexplode(col("embedding")).as(Seq("dim", "xv")))
        .select(col("vec_id"), col("dim").cast("long").as("dim"),
          round(col("xv").cast("double") * 1000000.0).cast("long").as("qx"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val st = x.groupBy(col("dim"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("qx").cast(dec)).as("sx"),
        sum(col("qx").cast(dec) * col("qx").cast(dec)).as("sxx"))
      .select(col("dim"),
        (col("sx").cast("double") / col("n").cast("double")).as("mean"),
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") /
          (col("n").cast("double") * col("n").cast("double"))).as("std"))
    x.filter(col("vec_id") < 8).join(broadcast(st), Seq("dim"))
      .select(col("vec_id"), col("dim"),
        round(col("mean") / 1000000.0, 6).as("dim_mean"),
        round(col("std") / 1000000.0, 6).as("dim_std"),
        when(col("std") > 0,
          round((col("qx").cast("double") - col("mean")) / col("std"), 6))
          .otherwise(lit(0.0)).as("z"))
  }

  val qEmbedNormSql: String =
    """WITH x AS (
      |  SELECT vec_id, CAST(r.i - 1 AS BIGINT) AS dim,
      |    CAST(round(CAST(embedding[r.i] AS DOUBLE) * 1000000.0) AS BIGINT)
      |      AS qx
      |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)),
      |m AS (SELECT dim, count(*) AS n, sum(qx) AS sx, sum(qx * qx) AS sxx
      |      FROM x GROUP BY 1),
      |st AS (SELECT dim,
      |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) /
      |      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS std
      |  FROM m)
      |SELECT x.vec_id, x.dim,
      |  round(st.mean / 1000000.0, 6) AS dim_mean,
      |  round(st.std / 1000000.0, 6) AS dim_std,
      |  CASE WHEN st.std > 0
      |    THEN round((CAST(x.qx AS DOUBLE) - st.mean) / st.std, 6)
      |    ELSE 0.0 END AS z
      |FROM x JOIN st USING (dim) WHERE x.vec_id < 8""".stripMargin

  /** Two-sample Kolmogorov–Smirnov statistic per event type: D =
    * max |F̂₁ − F̂₂| between the value distributions of the two
    * user-parity variants — the standard "did the experiment change
    * the DISTRIBUTION, not just the mean" companion to q_cuped.
    * Computed on quantized integer values: per distinct value the
    * cumulative per-variant counts are exact integers (ranking
    * windows partition by event type), each CDF point is one double
    * division, and D is a max over identically-computed doubles —
    * deterministic in both engines, rounded once.
    */
  def qKsTest(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("q"),
        (col("user_id") % 2).as("variant"))
    val pts = ev.groupBy(col("event_type"), col("q"))
      .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("c1"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("q"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    pts
      .withColumn("cum0", sum(col("c0")).over(w))
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("n0", sum(col("c0")).over(wt))
      .withColumn("n1", sum(col("c1")).over(wt))
      .groupBy(col("event_type"))
      .agg(max(col("n0")).as("n0"), max(col("n1")).as("n1"),
        max(abs(col("cum0").cast("double") / col("n0").cast("double") -
          col("cum1").cast("double") / col("n1").cast("double"))).as("d_raw"))
      .select(col("event_type"), col("n0"), col("n1"),
        round(col("d_raw"), 6).as("ks_d"))
  }

  val qKsTestSql: String =
    """WITH ev AS (
      |  SELECT event_type,
      |    CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT) AS q,
      |    user_id % 2 AS variant
      |  FROM events),
      |pts AS (
      |  SELECT event_type, q,
      |    sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS c0,
      |    sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS c1
      |  FROM ev GROUP BY 1, 2),
      |cdf AS (
      |  SELECT event_type,
      |    sum(c0) OVER (PARTITION BY event_type ORDER BY q
      |      ROWS UNBOUNDED PRECEDING) AS cum0,
      |    sum(c1) OVER (PARTITION BY event_type ORDER BY q
      |      ROWS UNBOUNDED PRECEDING) AS cum1,
      |    sum(c0) OVER (PARTITION BY event_type) AS n0,
      |    sum(c1) OVER (PARTITION BY event_type) AS n1
      |  FROM pts)
      |SELECT event_type, CAST(max(n0) AS BIGINT) AS n0,
      |  CAST(max(n1) AS BIGINT) AS n1,
      |  round(max(abs(CAST(cum0 AS DOUBLE) / CAST(n0 AS DOUBLE) -
      |    CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE))), 6) AS ks_d
      |FROM cdf GROUP BY 1""".stripMargin

  /** One-sided CUSUM change-point detection per event type
    * ([[graft.ops.ChangePoint]], Page 1954): κ = σ/2 allowance,
    * h = 4σ decision interval over the daily milli-unit mean series,
    * with a +20.0 level shift PLANTED on days ≥ 2024-01-21 (the same
    * plant-and-replay pattern as q_token_drift) — the sequential
    * monitor must alarm shortly after the shift, and the oracle's
    * recursive CTE replays the identical recursion bit-for-bit, so
    * the alarm DAY itself is hash-gated, not just the summary. The
    * corpus reduces via one (type, day) map-combined aggregate;
    * the recursion folds day-range-bounded arrays in a codegen'd
    * higher-order `aggregate` — no iterative jobs, no driver loop.
    */
  def qCusum(s: SparkSession, d: String): DataFrame = {
    val shifted = Tables.events(s, d)
      .withColumn("value2", col("value") +
        when(to_date(col("ts")) >= lit("2024-01-21").cast(DateType),
          20.0d).otherwise(0.0d))
    graft.ops.ChangePoint.cusum(
      graft.ops.ChangePoint.dailyMilliMean(
        shifted, "event_type", "ts", "value2"),
      "event_type")
  }

  val qCusumSql: String =
    """WITH RECURSIVE ev AS (
      |  SELECT event_type, cast(ts as date) AS day,
      |    cast(round((value + CASE WHEN cast(ts as date) >= DATE '2024-01-21'
      |      THEN 20.0 ELSE 0.0 END) * 1000.0) as bigint) AS v
      |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
      |daily AS (
      |  SELECT event_type, day,
      |    cast(round(cast(sum(v) as double) / cast(count(*) as double))
      |      as bigint) AS m
      |  FROM ev GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, count(*) AS n_days,
      |    cast(sum(m) as double) / cast(count(*) as double) AS mu,
      |    sqrt(greatest(0.0,
      |      cast(sum(m * m) as double) / cast(count(*) as double) -
      |      (cast(sum(m) as double) / cast(count(*) as double)) *
      |      (cast(sum(m) as double) / cast(count(*) as double)))) AS sigma
      |  FROM daily GROUP BY 1),
      |o AS (
      |  SELECT event_type, day, m,
      |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      |  FROM daily),
      |r AS (
      |  SELECT o.event_type, o.rn, o.day,
      |    greatest(0.0, 0.0 + ((cast(o.m as double) - st.mu) -
      |      st.sigma * 0.5)) AS s
      |  FROM o JOIN st USING (event_type) WHERE o.rn = 1
      |  UNION ALL
      |  SELECT o.event_type, o.rn, o.day,
      |    greatest(0.0, r.s + ((cast(o.m as double) - st.mu) -
      |      st.sigma * 0.5))
      |  FROM r JOIN o ON o.event_type = r.event_type AND o.rn = r.rn + 1
      |    JOIN st ON st.event_type = r.event_type)
      |SELECT st.event_type, cast(st.n_days as bigint) AS n_days,
      |  round(st.mu, 6) AS mu, round(st.sigma, 6) AS sigma,
      |  round(max(r.s), 6) AS max_s,
      |  strftime(min(r.day) FILTER (WHERE r.s > st.sigma * 4.0),
      |    '%Y-%m-%d') AS first_alarm,
      |  cast(count(*) FILTER (WHERE r.s > st.sigma * 4.0) as bigint)
      |    AS n_alarms
      |FROM r JOIN st USING (event_type)
      |GROUP BY st.event_type, st.n_days, st.mu, st.sigma""".stripMargin

  /** Poisson-bootstrap CI for mean document length per source
    * ([[graft.ops.Bootstrap.meanCi]], B = 64 replicates) — the error
    * bar a pipeline should publish next to every corpus point estimate
    * (a 1%-of-budget source's mean can swing wildly; the CI says by
    * how much). Each row's replicate-b multiplicity is the inverse
    * Poisson(1) CDF of its hash coordinate at key "doc_id:b" — the
    * single-pass, shardable form of resampling-with-replacement — so
    * the whole bootstrap is one B-way row expansion into one
    * map-combined aggregate: shuffle volume sources×64 regardless of
    * corpus size, and every count, replicate sum, and order statistic
    * is a pure function of the data, replayed exactly by the oracle
    * (CDF breakpoints are shared 6-dp literals). CI bounds are the
    * 2nd/63rd order statistics of the replicate means (~2.5%/97.5%).
    */
  def qBootstrapCi(s: SparkSession, d: String): DataFrame =
    graft.ops.Bootstrap.meanCi(
      Tables.documents(s, d).select(col("doc_id"), col("source"),
        col("n_chars")),
      keyCol = "doc_id", groupCol = "source", valueCol = "n_chars")

  val qBootstrapCiSql: String = {
    val u = graft.ops.Sampling.coordinateSql(
      "cast(doc_id as varchar) || ':' || cast(b as varchar)")
    val c = graft.ops.Bootstrap.poissonCountSql("u")
    s"""WITH reps AS (
       |  SELECT d.source, d.n_chars, b.b, $u AS u
       |  FROM documents d
       |  CROSS JOIN (SELECT unnest(range(64)) AS b) b),
       |cnt AS (SELECT source, n_chars, b, $c AS c FROM reps),
       |g AS (
       |  SELECT source, b,
       |    cast(sum(cast(c as bigint) * n_chars) as bigint) AS scx,
       |    cast(sum(c) as bigint) AS sc
       |  FROM cnt GROUP BY 1, 2),
       |m AS (
       |  SELECT source, b,
       |    round(cast(scx as double) / cast(sc as double), 6) AS mean
       |  FROM g WHERE sc > 0),
       |r AS (
       |  SELECT source, b, mean,
       |    cast(row_number() OVER (PARTITION BY source
       |      ORDER BY mean, b) as bigint) AS rn,
       |    cast(count(*) OVER (PARTITION BY source) as bigint) AS cnt
       |  FROM m),
       |ci AS (
       |  SELECT source, max(cnt) AS n_boot,
       |    max(CASE WHEN rn = 2 THEN mean END) AS ci_lo,
       |    max(CASE WHEN rn = cnt - 1 THEN mean END) AS ci_hi
       |  FROM r GROUP BY 1),
       |f AS (
       |  SELECT source,
       |    round(cast(cast(sum(n_chars) as bigint) as double) /
       |      cast(count(*) as double), 6) AS mean_n_chars
       |  FROM documents GROUP BY 1)
       |SELECT f.source, f.mean_n_chars, ci.n_boot, ci.ci_lo, ci.ci_hi
       |FROM f JOIN ci USING (source)""".stripMargin
  }

  /** Herfindahl–Hirschman concentration of the corpus: per language,
    * the sum of squared source shares of total characters — the
    * "is this slice dominated by one domain" number that decides
    * whether a per-domain cap (q_curation_v6) has anything to do.
    * Exact integer char sums; shares and the index are one double
    * expression replayed verbatim, with the max share and its source
    * alongside (integer struct-argmax).
    */
  def qHhi(s: SparkSession, d: String): DataFrame = {
    val src = Tables.documents(s, d)
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("n_chars")).as("chars"))
    val tot = src.groupBy(col("lang"))
      .agg(sum(col("chars")).as("total"), count(lit(1)).as("n_sources"))
    // HHI = Σ chars² / total² with Σ chars² an EXACT decimal(38,0)
    // sum (a double Σ share² would be partition-order dependent)
    src.join(tot, Seq("lang"))
      .groupBy(col("lang"))
      .agg(max(col("n_sources")).as("n_sources"),
        max(col("total")).as("total_chars"),
        sum(col("chars").cast("decimal(38,0)") *
          col("chars").cast("decimal(38,0)")).as("sq"),
        max(struct(col("chars"), col("source"))).as("w"))
      .select(col("lang"), col("n_sources"), col("total_chars"),
        round(col("sq").cast("double") /
          (col("total_chars").cast("double") *
            col("total_chars").cast("double")), 6).as("hhi"),
        col("w.source").as("top_source"),
        round(col("w.chars").cast("double") /
          col("total_chars").cast("double"), 6).as("top_share"))
  }

  val qHhiSql: String =
    """WITH src AS (
      |  SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS chars
      |  FROM documents GROUP BY 1, 2),
      |tot AS (SELECT lang, CAST(sum(chars) AS BIGINT) AS total,
      |          count(*) AS n_sources
      |        FROM src GROUP BY 1),
      |sh AS (
      |  SELECT s.lang, s.source, s.chars, t.total, t.n_sources
      |  FROM src s JOIN tot t USING (lang)),
      |top AS (
      |  SELECT lang, source AS top_source, chars AS top_chars FROM (
      |    SELECT lang, source, chars, row_number() OVER (PARTITION BY lang
      |      ORDER BY chars DESC, source DESC) AS rn FROM sh) WHERE rn = 1)
      |SELECT sh.lang, max(sh.n_sources) AS n_sources,
      |  max(sh.total) AS total_chars,
      |  round(CAST(sum(sh.chars * sh.chars) AS DOUBLE) /
      |    (CAST(max(sh.total) AS DOUBLE) * CAST(max(sh.total) AS DOUBLE)), 6)
      |    AS hhi,
      |  max(t.top_source) AS top_source,
      |  round(max(CAST(t.top_chars AS DOUBLE)) /
      |    CAST(max(sh.total) AS DOUBLE), 6) AS top_share
      |FROM sh JOIN top t USING (lang)
      |GROUP BY 1""".stripMargin

  /** Measured MinHash-LSH recall by similarity band: the true pair
    * set is the EXACT shingle-Jaccard pairs (q_ngram_jaccard's
    * block-local truth, same w=3 shingles the signatures hash), the
    * candidate set is the banded-LSH bucket join (q_minhash_pairs),
    * and recall is reported per exact-Jaccard quartile band — the
    * S-curve readout that tells an operator whether the configured
    * (bands, rows) actually catches the 0.75+ near-dups the pipeline
    * drops. Same close-the-measurement-loop discipline as
    * q_ann_recall; all counts integer, one division per band. On this
    * synthetic corpus the planted near-dups all sit in the top band
    * (jaccard ≥ 0.75, recall 1.0 at every SF) — the banded shape is
    * what a real web corpus with a genuine similarity spectrum
    * exercises.
    */
  def qMinhashRecall(s: SparkSession, d: String): DataFrame = {
    val truth = qNgramJaccard(s, d)
      .withColumn("band", least(floor(col("jaccard") * 4), lit(3L)))
    val cand = qMinhashPairs(s, d)
      .select(col("id_a"), col("id_b"), lit(1L).as("hit"))
    truth.join(cand, Seq("id_a", "id_b"), "left")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .select(col("band"), col("n_true"), col("n_hit"),
        round(col("n_hit").cast("double") / col("n_true").cast("double"), 6)
          .as("recall"))
  }

  lazy val qMinhashRecallSql: String =
    s"""WITH truth AS (
       |$qNgramJaccardSql),
       |cand AS (
       |$qMinhashPairsSql),
       |j AS (
       |  SELECT least(CAST(floor(t.jaccard * 4) AS BIGINT), 3) AS band,
       |    CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END AS hit
       |  FROM truth t LEFT JOIN cand c
       |    ON t.id_a = c.id_a AND t.id_b = c.id_b)
       |SELECT band, count(*) AS n_true, CAST(sum(hit) AS BIGINT) AS n_hit,
       |  round(CAST(sum(hit) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS recall
       |FROM j GROUP BY 1""".stripMargin

  /** Experiment power readout: per-variant user counts, means and
    * variances of post-period spend from EXACT integer moments (the
    * q_cuped discipline), then the minimum detectable effect at
    * α=0.05 / power 0.8 — mde = 2.8·√(σ₀²/n₀ + σ₁²/n₁) — the number
    * that says whether the A/B is even worth reading. The only float
    * steps are the final fixed-shape expression (division, sqrt,
    * multiply), replayed verbatim; everything upstream is
    * decimal(38,0) ≙ HUGEINT.
    */
  def qPower(s: SparkSession, d: String): DataFrame = {
    val dec = "decimal(38,0)"
    val per = Tables.events(s, d)
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("q"))
      .groupBy(col("user_id"))
      .agg(sum(col("q")).as("y"))
      .withColumn("variant", (col("user_id") % 2).cast("long"))
    val m = per.groupBy(col("variant"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"))
      .select(col("variant"), col("n").cast("long").as("n_users"),
        (col("sy").cast("double") / col("n").cast("double")).as("mean_c"),
        ((col("n") * col("syy") - col("sy") * col("sy")).cast("double") /
          (col("n").cast("double") * col("n").cast("double"))).as("var_c"))
    val w = m.agg(
      max(when(col("variant") === 0, col("n_users"))).as("n0"),
      max(when(col("variant") === 1, col("n_users"))).as("n1"),
      max(when(col("variant") === 0, col("mean_c"))).as("m0"),
      max(when(col("variant") === 1, col("mean_c"))).as("m1"),
      max(when(col("variant") === 0, col("var_c"))).as("v0"),
      max(when(col("variant") === 1, col("var_c"))).as("v1"))
    w.select(col("n0"), col("n1"),
      round(col("m0") / 100.0, 6).as("mean_0"),
      round(col("m1") / 100.0, 6).as("mean_1"),
      round(lit(2.8) * sqrt(col("v0") / col("n0").cast("double") +
        col("v1") / col("n1").cast("double")) / 100.0, 6)
        .as("mde_dollars"))
  }

  val qPowerSql: String =
    """WITH per AS (
      |  SELECT user_id,
      |    CAST(sum(CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT))
      |      AS BIGINT) AS y,
      |    CAST(user_id % 2 AS BIGINT) AS variant
      |  FROM events GROUP BY user_id),
      |m AS (
      |  SELECT variant, count(*) AS n_users,
      |    CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_c,
      |    CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS DOUBLE) /
      |      (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE)) AS var_c
      |  FROM per GROUP BY 1),
      |w AS (
      |  SELECT max(CASE WHEN variant = 0 THEN n_users END) AS n0,
      |    max(CASE WHEN variant = 1 THEN n_users END) AS n1,
      |    max(CASE WHEN variant = 0 THEN mean_c END) AS m0,
      |    max(CASE WHEN variant = 1 THEN mean_c END) AS m1,
      |    max(CASE WHEN variant = 0 THEN var_c END) AS v0,
      |    max(CASE WHEN variant = 1 THEN var_c END) AS v1
      |  FROM m)
      |SELECT n0, n1,
      |  round(m0 / 100.0, 6) AS mean_0,
      |  round(m1 / 100.0, 6) AS mean_1,
      |  round(2.8 * sqrt(v0 / CAST(n0 AS DOUBLE) +
      |    v1 / CAST(n1 AS DOUBLE)) / 100.0, 6) AS mde_dollars
      |FROM w""".stripMargin

  /** Mutual information between language and source — the corpus-
    * dependence statistic mixture design reads before treating the
    * two as independent knobs (MI ≈ 0 ⇒ per-lang and per-source caps
    * compose; high MI ⇒ they fight). Cell contributions quantized to
    * integer nano-nats (round(10⁹·(c/N)·ln(cN/(cx·cy))) — the
    * q_token_drift discipline: one ln+round per CELL, exact integer
    * sum across cells), emitted per cell with the corpus total.
    */
  def qMutualInfo(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val cxy = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("c"))
    val cx = cxy.groupBy(col("lang")).agg(sum(col("c")).as("cl"))
    val cy = cxy.groupBy(col("source")).agg(sum(col("c")).as("cs"))
    val n = cxy.agg(sum(col("c")).as("n"))
    val cells = cxy.join(cx, Seq("lang")).join(cy, Seq("source"))
      .crossJoin(broadcast(n))
      .withColumn("contrib_nnats",
        round((col("c").cast("double") / col("n").cast("double")) *
          log(col("c").cast("double") * col("n").cast("double") /
            (col("cl").cast("double") * col("cs").cast("double"))) *
          1000000000.0).cast("long"))
    val tot = cells.agg(sum(col("contrib_nnats")).as("t"))
      .select(round(col("t").cast("double") / 1000000000.0, 6)
        .as("mi_nats"))
    cells.select(col("lang"), col("source"), col("c").as("n_docs"),
        col("contrib_nnats"))
      .crossJoin(broadcast(tot))
  }

  val qMutualInfoSql: String =
    """WITH cxy AS (SELECT lang, source, count(*) AS c
      |             FROM documents GROUP BY 1, 2),
      |cx AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cl FROM cxy GROUP BY 1),
      |cy AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs
      |       FROM cxy GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cxy),
      |cells AS (
      |  SELECT cxy.lang, cxy.source, cxy.c,
      |    CAST(round((CAST(c AS DOUBLE) / CAST(n.n AS DOUBLE)) *
      |      ln(CAST(c AS DOUBLE) * CAST(n.n AS DOUBLE) /
      |        (CAST(cl AS DOUBLE) * CAST(cs AS DOUBLE))) *
      |      1000000000.0) AS BIGINT) AS contrib_nnats
      |  FROM cxy JOIN cx USING (lang) JOIN cy USING (source) CROSS JOIN n),
      |tot AS (SELECT round(CAST(sum(contrib_nnats) AS DOUBLE) /
      |          1000000000.0, 6) AS mi_nats FROM cells)
      |SELECT lang, source, c AS n_docs, contrib_nnats, tot.mi_nats
      |FROM cells CROSS JOIN tot""".stripMargin

  /** Pearson chi-square independence test over the same lang×source
    * contingency — the significance-scaled complement of
    * q_mutual_info's effect-size readout (MI says how entangled; χ²
    * + Cramér's V says whether the entanglement clears sampling
    * noise at this corpus size). The FULL grid is tested, including
    * EMPTY cells (an absent lang×source combination still contributes
    * its expected count — dropping zero cells understates χ², the
    * classic observed-cells-only mistake), via margins-cross-join ⟕
    * observed counts. Cell contributions quantized to integer
    * nano-units (one round per cell, exact integer sum — the
    * q_mutual_info discipline so the total is partition-order-free);
    * Cramér's V and dof ride every row from one broadcast scalar.
    * Scale shape: margins are tiny aggregates of the cell table; the
    * grid is |langs|×|sources| rows regardless of corpus size.
    */
  def qChi2(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val cxy = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("c"))
    val cx = cxy.groupBy(col("lang")).agg(sum(col("c")).as("cl"))
    val cy = cxy.groupBy(col("source")).agg(sum(col("c")).as("cs"))
    val n = cxy.agg(sum(col("c")).as("n"))
    val dims = cx.agg(count(lit(1)).as("r"))
      .crossJoin(cy.agg(count(lit(1)).as("cc")))
    val cells = cx.crossJoin(cy)
      .join(cxy, Seq("lang", "source"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(n))
      .withColumn("e", col("cl").cast("double") * col("cs").cast("double")
        / col("n").cast("double"))
      .withColumn("contrib_nchi",
        round((col("c").cast("double") - col("e")) *
          (col("c").cast("double") - col("e")) / col("e") *
          1000000000.0).cast("long"))
    val tot = cells.agg(sum(col("contrib_nchi")).as("t"),
        first(col("n")).as("n"))
      .crossJoin(broadcast(dims))
      .select(
        round(col("t").cast("double") / 1000000000.0, 6).as("chi2"),
        ((col("r") - 1) * (col("cc") - 1)).as("dof"),
        round(sqrt((col("t").cast("double") / 1000000000.0) /
          (col("n").cast("double") *
            least(col("r") - 1, col("cc") - 1).cast("double"))), 6)
          .as("cramers_v"))
    cells.select(col("lang"), col("source"), col("c").as("n_docs"),
        col("contrib_nchi"))
      .crossJoin(broadcast(tot))
  }

  val qChi2Sql: String =
    """WITH cxy AS (SELECT lang, source, count(*) AS c
      |             FROM documents GROUP BY 1, 2),
      |cx AS (SELECT lang, CAST(sum(c) AS BIGINT) AS cl FROM cxy GROUP BY 1),
      |cy AS (SELECT source, CAST(sum(c) AS BIGINT) AS cs
      |       FROM cxy GROUP BY 1),
      |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cxy),
      |dims AS (SELECT (SELECT count(*) FROM cx) AS r,
      |                (SELECT count(*) FROM cy) AS cc),
      |cells AS (
      |  SELECT cx.lang, cy.source, CAST(coalesce(cxy.c, 0) AS BIGINT) AS c,
      |    CAST(round((CAST(coalesce(cxy.c, 0) AS DOUBLE) -
      |        CAST(cl AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(n.n AS DOUBLE)) *
      |      (CAST(coalesce(cxy.c, 0) AS DOUBLE) -
      |        CAST(cl AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(n.n AS DOUBLE)) /
      |      (CAST(cl AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(n.n AS DOUBLE)) *
      |      1000000000.0) AS BIGINT) AS contrib_nchi
      |  FROM cx CROSS JOIN cy
      |  LEFT JOIN cxy ON cxy.lang = cx.lang AND cxy.source = cy.source
      |  CROSS JOIN n),
      |tot AS (SELECT
      |    round(CAST(sum(contrib_nchi) AS DOUBLE) / 1000000000.0, 6) AS chi2,
      |    CAST((r - 1) * (cc - 1) AS BIGINT) AS dof,
      |    round(sqrt((CAST(sum(contrib_nchi) AS DOUBLE) / 1000000000.0) /
      |      (CAST((SELECT n FROM n) AS DOUBLE) *
      |        CAST(least(r - 1, cc - 1) AS DOUBLE))), 6) AS cramers_v
      |  FROM cells CROSS JOIN dims GROUP BY r, cc)
      |SELECT cells.lang, cells.source, cells.c AS n_docs,
      |  cells.contrib_nchi, tot.chi2, tot.dof, tot.cramers_v
      |FROM cells CROSS JOIN tot""".stripMargin

  /** Hashing-trick feature vectorizer (1024 buckets): token counts
    * folded into a fixed-width sparse vector by portable hash — the
    * input representation a fastText-style classifier
    * (q_classifier) trains on, with no vocabulary table to build,
    * ship, or keep consistent across runs (THE point of the trick at
    * corpus scale: feature extraction is a pure narrow map + one
    * per-doc aggregation, zero global state). Sparse features emit as
    * a sorted "bucket:count" string (the q_tokenize canonicalization
    * — the driver's comparator cannot sort array cells).
    */
  def qFeatureHash(s: SparkSession, d: String): DataFrame = {
    val nBuckets = 1024
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("doc_id"),
        (TextAnalysis.hash60(col("tok")) % nBuckets).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_features"),
        sum(col("c")).as("n_tokens"),
        array_join(
          transform(sort_array(collect_list(struct(col("bucket"), col("c")))),
            x => concat(x.getField("bucket").cast(StringType), lit(":"),
              x.getField("c").cast(StringType))), ",").as("features"))
  }

  val qFeatureHashSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
       |b AS (SELECT doc_id, ${hash60Sql("tok")} % 1024 AS bucket FROM toks),
       |c AS (SELECT doc_id, bucket, count(*) AS c FROM b GROUP BY 1, 2)
       |SELECT doc_id, count(*) AS n_features,
       |  CAST(sum(c) AS BIGINT) AS n_tokens,
       |  array_to_string(
       |    list(bucket || ':' || c ORDER BY bucket), ',') AS features
       |FROM c GROUP BY doc_id""".stripMargin

  /** Quantile treatment effects: per-variant p50/p90/p99 of event
    * value from the bounded histogram sketch, differenced — the
    * tail-sensitive experiment readout that catches what a mean
    * (q_cuped) and even a distribution test (q_ks_test) summarize
    * away: WHERE in the distribution the variants diverge. Quantiles
    * come from the same fixed-grid sketch as q_quantile_hist (exact
    * integer counters, one interpolation each); the effect is a
    * difference of two already-rounded estimates, replayed verbatim.
    */
  def qQte(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select((col("user_id") % 2).cast("long").as("variant"), col("value"))
    val qs = graft.sketch.QuantileHist.quantiles(ev, Seq("variant"), "value",
      lo = 0.0, hi = 256.0, nBins = 128, qs = Seq(0.5, 0.9, 0.99))
    qs.groupBy(col("q"))
      .agg(max(when(col("variant") === 0, col("est"))).as("est_0"),
        max(when(col("variant") === 1, col("est"))).as("est_1"))
      .select(col("q"), col("est_0"), col("est_1"),
        round(col("est_1") - col("est_0"), 6).as("qte"))
  }

  val qQteSql: String = {
    val inner = graft.sketch.QuantileHist.quantileOracleSql(
      "(SELECT CAST(user_id % 2 AS BIGINT) AS variant, value FROM events)",
      "variant", "value", lo = 0.0, hi = 256.0, nBins = 128,
      qs = Seq(0.5, 0.9, 0.99))
    s"""WITH qs AS (
       |$inner)
       |SELECT q,
       |  max(CASE WHEN variant = 0 THEN est END) AS est_0,
       |  max(CASE WHEN variant = 1 THEN est END) AS est_1,
       |  round(max(CASE WHEN variant = 1 THEN est END) -
       |        max(CASE WHEN variant = 0 THEN est END), 6) AS qte
       |FROM qs GROUP BY 1""".stripMargin
  }
}
