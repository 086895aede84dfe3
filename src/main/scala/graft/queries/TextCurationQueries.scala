package graft.queries

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.Ann
import graft.text.{Bm25, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis, quality/curation, sampling and mixture queries.
  *
  * Part of the [[PipelineQueries]] linear trait chain: each trait
  * extends the previous one, so member initialization order and
  * visibility are IDENTICAL to the former single-object layout (the
  * chain is a file split, not an architecture: everything still
  * composes into the one PipelineQueries object).
  */
private[queries] trait TextCurationQueries extends PipelineSqlBase {
  // -------------------------------------------------------- text analysis

  /** Token counting: whitespace tokens + BPE-ish subword estimate. */
  def qTokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.subwordEstimate(col("text")).as("n_subwords"),
      length(col("text")).as("n_chars_calc"))

  val qTokenCountSql: String =
    s"""SELECT doc_id,
       |  len($toksSql) AS n_tokens,
       |  cast(ceil(length(text) / 4.0) as bigint) AS n_subwords,
       |  length(text) AS n_chars_calc
       |FROM documents""".stripMargin

  /** Top-20 adjacent-token bigrams with occurrence and document
    * frequency — corpus collocation statistics (vocabulary-induction /
    * boilerplate-phrase surface). Scale shape: a narrow bigram map
    * (token array let-bound once per row), one partial-aggregated
    * count shuffle, and a TakeOrdered(20) — no full sort. Ties are
    * broken on the bigram string so top-k is engine-deterministic.
    */
  def qBigrams(s: SparkSession, d: String): DataFrame = {
    // let-bind the token array as a lambda variable (single-element
    // transform), same trick as Dedup.shingleHashes: the two element_at
    // reads per bigram hit the bound array, not the tokenizer expr
    val bigrams = element_at(
      transform(array(TextAnalysis.tokens(col("text"))), t =>
        transform(
          when(size(t) >= 2, sequence(lit(1), size(t) - 1))
            .otherwise(array().cast(ArrayType(IntegerType))),
          i => concat_ws(" ", element_at(t, i), element_at(t, i + 1)))),
      1)
    Tables.documents(s, d)
      .select(col("doc_id"), explode(bigrams).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(20)
  }

  val qBigramsSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |u AS (SELECT doc_id,
       |        unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
       |          i -> toks[i] || ' ' || toks[i+1])) AS bigram
       |      FROM t)
       |SELECT bigram, count(*) AS n, count(distinct doc_id) AS n_docs
       |FROM u GROUP BY bigram
       |ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin

  /** Corpus tokenization to vocabulary ids — the encode step before
    * training shards are written: a frequency-ranked, SIZE-CAPPED
    * vocabulary (top maxVocab by count desc, token asc — fully
    * deterministic; out-of-vocabulary tokens are dropped, the
    * fixed-vocab contract every real tokenizer has), then each
    * document mapped to its id sequence in token order.
    *
    * Scale shape: the vocabulary cut is a DISTRIBUTED top-k
    * (TakeOrderedAndProject after the partial-aggregated count
    * shuffle — never a single-partition sort of all distinct tokens,
    * which at web scale is billions of junk strings); the id window
    * then runs over the ≤maxVocab survivors only. Encoding is one
    * equi-join of the exploded token stream against the capped vocab
    * (AQE broadcasts it) and a per-doc ordered reassembly bounded by
    * document length.
    */
  def qTokenize(s: SparkSession, d: String): DataFrame = {
    val maxVocab = 65536
    // the token stream feeds BOTH the vocabulary build and the probe
    // side of the encode join — persist it once (same shape as
    // UnigramLm.score / Dedup.spanProfile) so the scan+tokenize map
    // doesn't run twice
    val toks = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(Tables.documents(s, d))
        .select(col("doc_id"),
          posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc).limit(maxVocab)
      .withColumn("vid", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("tok").asc)).cast(LongType))
      .select(col("tok"), col("vid"))
    // ids is emitted as a comma-joined STRING, not array<long>: the
    // driver's pandas canonicalizer cannot sort array cells (same
    // canonicalization as q_minhash_sig's signature column)
    toks.join(vocab, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        array_join(
          transform(sort_array(collect_list(struct(col("pos"), col("vid")))),
            x => x.getField("vid").cast(StringType)),
          ",").as("ids"))
  }

  val qTokenizeSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |u AS (SELECT doc_id, r.i AS pos, toks[r.i] AS tok
       |      FROM t, unnest(range(1, len(toks) + 1)) AS r(i)),
       |vc AS (SELECT tok, count(*) AS c FROM u GROUP BY tok
       |       ORDER BY c DESC, tok ASC LIMIT 65536),
       |v AS (SELECT tok,
       |        row_number() OVER (ORDER BY c DESC, tok ASC) AS vid
       |      FROM vc)
       |SELECT u.doc_id, count(*) AS n_tokens,
       |  array_to_string(list(v.vid ORDER BY u.pos), ',') AS ids
       |FROM u JOIN v USING (tok)
       |GROUP BY u.doc_id""".stripMargin

  /** Quality scoring: stopword/punct/digit ratios + composite score. */
  def qTextQuality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.stopwordRatio(col("text")).as("stop_ratio"),
      TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
      TextAnalysis.digitRatio(col("text")).as("digit_ratio"),
      TextAnalysis.meanTokenLen(col("text")).as("mean_tok_len"),
      TextAnalysis.qualityScore(col("text")).as("quality"))

  val qTextQualitySql: String = {
    val stops = inList(TextAnalysis.defaultStopwords)
    s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
       |SELECT doc_id,
       |  round(CASE WHEN len(toks) > 0
       |    THEN len(list_filter(toks, x -> x IN $stops)) * 1.0 / len(toks)
       |    ELSE 0.0 END, 6) AS stop_ratio,
       |  round(CASE WHEN length(text) > 0
       |    THEN length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) * 1.0 / length(text)
       |    ELSE 0.0 END, 6) AS punct_ratio,
       |  round(CASE WHEN length(text) > 0
       |    THEN length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text)
       |    ELSE 0.0 END, 6) AS digit_ratio,
       |  round(CASE WHEN len(toks) > 0
       |    THEN length(regexp_replace(text, '\\s', '', 'g')) * 1.0 / len(toks)
       |    ELSE 0.0 END, 6) AS mean_tok_len,
       |  round((
       |    least(len(toks) / 100.0, 1.0) +
       |    least(round(CASE WHEN len(toks) > 0
       |      THEN len(list_filter(toks, x -> x IN $stops)) * 1.0 / len(toks)
       |      ELSE 0.0 END, 6) * 4.0, 1.0) +
       |    greatest(1.0 - round(CASE WHEN length(text) > 0
       |      THEN length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) * 1.0 / length(text)
       |      ELSE 0.0 END, 6) * 4.0, 0.0) +
       |    greatest(1.0 - round(CASE WHEN length(text) > 0
       |      THEN length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text)
       |      ELSE 0.0 END, 6) * 4.0, 0.0)
       |  ) / 4.0, 6) AS quality
       |FROM t""".stripMargin
  }

  /** The deterministic URL-synthesis expression shared by
    * `q_url_profile` and `q_curation_v6`: every suffix class occurs.
    */
  private[queries] def urlHostExpr: org.apache.spark.sql.Column = {
    val h = TextAnalysis.hash60(col("doc_id").cast(StringType)) % 5
    when(h === 0, concat(col("source"), lit(".com")))
      .when(h === 1, concat(lit("www."), col("source"), lit(".co.uk")))
      .when(h === 2, concat(lit("blog"), pmod(col("doc_id"), lit(7)),
        lit("."), col("source"), lit(".github.io")))
      .when(h === 3, concat(col("source"), lit(".org.uk")))
      .otherwise(concat(lit("cdn."), col("source"), lit(".net")))
  }

  /** DuckDB twin of [[urlHostExpr]] (a CASE over the same hash). */
  private[queries] lazy val urlHostCaseSql: String = {
    val h = s"${graft.ops.Sampling.hash60Sql("cast(doc_id as varchar)")} % 5"
    s"""CASE WHEN $h = 0 THEN source || '.com'
       |       WHEN $h = 1 THEN 'www.' || source || '.co.uk'
       |       WHEN $h = 2 THEN 'blog' || (doc_id % 7) || '.' || source || '.github.io'
       |       WHEN $h = 3 THEN source || '.org.uk'
       |       ELSE 'cdn.' || source || '.net' END""".stripMargin
  }

  /** URL → eTLD+1 domain profile (graft.text.UrlOps): URLs are
    * synthesized deterministically from (source, doc_id) so every
    * suffix class occurs — plain .com, www-prefixed .co.uk,
    * subdomained github.io private registry, .org.uk, cdn .net —
    * then host extraction (parse_url) and the PSL longest-match
    * eTLD+1 fold the host zoo onto registrable domains, and the
    * profile aggregates per domain: doc count, distinct hosts, token
    * mass, mean quality, corpus share. This is the keying stage
    * before any per-site policy (domain mixing weights, per-site
    * dedup caps, containment limits) — [[graft.ops.Sampling]]'s
    * domain mix consumes exactly this (domain, share) shape. The
    * share window runs over the AGGREGATED per-domain frame (bounded
    * by the domain count — model-state-sized), never the corpus.
    */
  def qUrlProfile(s: SparkSession, d: String): DataFrame = {
    import graft.text.{UrlOps => U}
    val docs = Tables.documents(s, d)
    val withUrl = docs.withColumn("url",
      concat(lit("https://"), urlHostExpr, lit("/doc/"), col("doc_id")))
    val staged = withUrl.select(
      col("doc_id"),
      U.host(col("url")).as("hst"),
      TextAnalysis.tokenCount(col("text")).as("n_toks"),
      TextAnalysis.qualityScore(col("text")).as("q"))
      .withColumn("domain", U.etld1(col("hst")))
    val prof = staged.groupBy(col("domain")).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("hst")).as("n_hosts"),
      sum(col("n_toks")).as("n_tokens"),
      round(sum(col("q").cast(DecimalType(18, 6))).cast(DoubleType) /
        count(lit(1)), 6).as("mean_quality"))
    prof.withColumn("share",
      round(col("n_docs").cast(DoubleType) /
        sum(col("n_docs")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()), 6))
  }

  lazy val qUrlProfileSql: String = {
    import graft.text.{UrlOps => U}
    s"""WITH u AS (SELECT doc_id, text,
       |  $urlHostCaseSql AS hb
       |FROM documents),
       |w AS (SELECT doc_id, text,
       |  'https://' || hb || '/doc/' || doc_id AS url FROM u),
       |st AS (SELECT doc_id,
       |  ${U.hostSql("url")} AS hst,
       |  len($toksSql) AS n_toks,
       |  ${qualityExprSql(toksSql, "text")} AS q
       |FROM w),
       |dom AS (SELECT doc_id, hst, n_toks, q,
       |  string_split(hst, '.') AS ls FROM st),
       |p AS (SELECT
       |  ${U.etld1Sql("ls")} AS domain,
       |  count(*) AS n_docs,
       |  count(distinct hst) AS n_hosts,
       |  cast(sum(n_toks) as bigint) AS n_tokens,
       |  round(cast(sum(cast(q as decimal(18,6))) as double) / count(*), 6)
       |    AS mean_quality
       |FROM dom GROUP BY 1)
       |SELECT domain, n_docs, n_hosts, n_tokens, mean_quality,
       |  round(cast(n_docs as double) / sum(n_docs) OVER (), 6) AS share
       |FROM p""".stripMargin
  }

  /** Per-registrable-domain keep cap for [[qCurationV6]]. Fixed and
    * absolute (the Common-Crawl-style anti-domination rule), small
    * enough to bind at every SF (~5 docs/domain at sf0.001, ~500 at
    * sf1).
    */
  private[graft] val DomainCap = 4

  /** Curation capstone v6 — the round-10 web-corpus operators
    * composed into the gate a crawl-scale curation stack actually
    * runs: synthesize the URL zoo ([[urlHostExpr]]), key every doc by
    * its eTLD+1 registrable domain (graft.text.UrlOps), score it with
    * the IN-ENGINE-TRAINED quality classifier
    * (graft.text.QualityClassifier — same corpus and label as
    * `q_classifier`, so the oracle reuses that query's full 10-round
    * trajectory replay verbatim), keep classifier-passed docs, and
    * cap each domain at [[DomainCap]] survivors ranked by
    * (score desc, doc_id) — the anti-single-site-domination rule.
    * Emits per-domain: docs in, classifier-passed, kept-after-cap,
    * kept token mass, quantized mean kept score.
    *
    * Scale shape: training is d+1 bounded scalar collects per round
    * (driver-held model); scoring and domain keying are one narrow
    * projection each; the rank-filter compiles to Spark 4's
    * WindowGroupLimit (map-side per-domain top-k BEFORE the
    * shuffle, pinned by PlanShapeSpec), so no domain ships more than
    * cap+ties rows per mapper; the final frames are domain-sized.
    */
  def qCurationV6(s: SparkSession, d: String): DataFrame = {
    import graft.text.{UrlOps => U}
    val docs = Tables.documents(s, d)
    val withUrl = docs.withColumn("url",
      concat(lit("https://"), urlHostExpr, lit("/doc/"), col("doc_id")))
    val scored = graft.text.QualityClassifier.fitScore(
      withUrl, col("text"),
      (TextAnalysis.qualityScore(col("text")) >= 0.65).cast(IntegerType),
      keep = Seq(col("doc_id"),
        U.etld1(U.host(col("url"))).as("domain"),
        TextAnalysis.tokenCount(col("text")).as("n_toks")))
    val perDomain = scored.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pred") === 1, 1L).otherwise(0L)).as("n_passed"))
    val capped = scored.filter(col("pred") === 1)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("domain"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rk") <= DomainCap)
    val kept = capped.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_toks")).as("toks_kept"),
        // score is a 6-dp-rounded double; sum its exact 1e6 integer
        // image (round BEFORE the long cast — Spark's cast truncates
        // where DuckDB's rounds) so the mean is order-independent
        round(sum(round(col("score") * 1e6).cast(LongType))
          .cast(DoubleType) / count(lit(1)) / 1e6, 6).as("mean_score"))
    perDomain.join(kept, Seq("domain"), "left")
      .select(col("domain"), col("n_docs"), col("n_passed"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("toks_kept"), lit(0L)).as("toks_kept"),
        // 0.0, not NULL, when a domain keeps nothing: NULL doubles
        // round-trip differently through parquet/pandas vs DuckDB
        coalesce(col("mean_score"), lit(0.0)).as("mean_score"))
  }

  // lazy: composes qClassifierSql (declared later in this object)
  lazy val qCurationV6Sql: String = {
    import graft.text.{UrlOps => U}
    s"""WITH clf AS (
       |$qClassifierSql),
       |u AS (SELECT doc_id, text, $urlHostCaseSql AS hb FROM documents),
       |w AS (SELECT doc_id, text,
       |  'https://' || hb || '/doc/' || doc_id AS url FROM u),
       |st AS (SELECT doc_id, ${U.hostSql("url")} AS hst,
       |  len($toksSql) AS n_toks FROM w),
       |dm AS (SELECT doc_id, n_toks, string_split(hst, '.') AS ls
       |       FROM st),
       |dd AS (SELECT doc_id, n_toks, ${U.etld1Sql("ls")} AS domain
       |       FROM dm),
       |j AS (SELECT dd.domain, dd.doc_id, dd.n_toks, c.score, c.pred
       |      FROM dd JOIN clf c USING (doc_id)),
       |allp AS (SELECT domain, count(*) AS n_docs,
       |    cast(sum(CASE WHEN pred = 1 THEN 1 ELSE 0 END) as bigint)
       |      AS n_passed
       |  FROM j GROUP BY 1),
       |rk AS (SELECT domain, doc_id, n_toks, score,
       |    row_number() OVER (PARTITION BY domain
       |      ORDER BY score DESC, doc_id) AS rk
       |  FROM j WHERE pred = 1),
       |kp AS (SELECT domain, count(*) AS n_kept,
       |    cast(sum(n_toks) as bigint) AS toks_kept,
       |    round(cast(sum(cast(round(score * 1000000) as bigint)) as double)
       |      / count(*) / 1000000, 6) AS mean_score
       |  FROM rk WHERE rk <= $DomainCap GROUP BY 1)
       |SELECT a.domain, a.n_docs, a.n_passed,
       |  coalesce(k.n_kept, 0) AS n_kept,
       |  coalesce(k.toks_kept, 0) AS toks_kept,
       |  coalesce(k.mean_score, 0.0) AS mean_score
       |FROM allp a LEFT JOIN kp k USING (domain)""".stripMargin
  }

  /** Gram width for [[qDecontam]] — 5 whitespace tokens (the
    * published pipelines use 13; the synthetic docs are short).
    */
  private[queries] val DecontamN = 5

  /** Benchmark decontamination (graft.text.Decontaminate): the
    * "benchmark" is synthesized deterministically from the corpus
    * itself — an 8-token middle slice (tokens 4..11) of every
    * doc with hash60(doc_id) % 16 = 5 plays the eval prompt — so the
    * sliced-from docs are PLANTED contamination (they contain their
    * own slice verbatim) and everything else is flagged only if it
    * genuinely shares a 5-gram. Output per corpus doc: distinct gram
    * count, benchmark-hit count, contaminated flag.
    */
  def qDecontam(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val bench = docs
      .filter(TextAnalysis.hash60(col("doc_id").cast(StringType))
        % 16 === 5)
      .select(concat_ws(" ",
        slice(TextAnalysis.tokens(col("text")), 4, 8)).as("bench_text"))
    graft.text.Decontaminate.audit(docs, "doc_id", "text",
      bench, "bench_text", DecontamN)
  }

  lazy val qDecontamSql: String = {
    val n = DecontamN
    def gram(ts: String) = hash60Sql(
      (0 until n).map(o => s"$ts[i+$o]").mkString(" || ' ' || "))
    val h16 = s"${hash60Sql("cast(doc_id as varchar)")} % 16"
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |g AS (SELECT doc_id, list_distinct(
       |        list_transform(range(1, greatest(len(toks) - ${n - 1}, 0) + 1),
       |          i -> ${gram("toks")})) AS hs
       |      FROM t),
       |bt AS (SELECT list_slice(toks, 4, 11) AS bt
       |       FROM t WHERE $h16 = 5),
       |bg AS (SELECT DISTINCT unnest(
       |        list_transform(range(1, greatest(len(bt) - ${n - 1}, 0) + 1),
       |          i -> ${gram("bt")})) AS h
       |       FROM bt),
       |u AS (SELECT doc_id, unnest(hs) AS h FROM g),
       |hits AS (SELECT u.doc_id, count(*) AS n_hit
       |         FROM u JOIN bg USING (h) GROUP BY 1)
       |SELECT g.doc_id, cast(len(g.hs) as bigint) AS n_grams,
       |  cast(coalesce(h.n_hit, 0) as bigint) AS n_hit,
       |  CASE WHEN coalesce(h.n_hit, 0) >= 1 THEN 1 ELSE 0 END
       |    AS contaminated
       |FROM g LEFT JOIN hits h USING (doc_id)""".stripMargin
  }

  /** The eval-owner's view of [[qDecontam]]: PER BENCHMARK ITEM, how
    * many corpus documents leak it (any shared width-n gram) and how
    * many distinct grams of the item occur anywhere in the corpus —
    * the report that decides which eval rows are still trustworthy.
    * Same asymmetric shape transposed: the benchmark gram table
    * (eval-suite-sized) broadcasts; the corpus side is the same two
    * narrow passes; aggregation is benchmark-grain (bounded output).
    */
  def qDecontamItems(s: SparkSession, d: String): DataFrame = {
    import graft.text.{Decontaminate => D}
    val docs = Tables.documents(s, d)
    val bench = docs
      .filter(TextAnalysis.hash60(col("doc_id").cast(StringType))
        % 16 === 5)
      .select(col("doc_id").as("bench_id"), concat_ws(" ",
        slice(TextAnalysis.tokens(col("text")), 4, 8)).as("bench_text"))
    val bg = bench.select(col("bench_id"),
      explode(D.gramSet(col("bench_text"), DecontamN)).as("h"))
    val cg = docs.select(col("doc_id"),
      explode(D.gramSet(col("text"), DecontamN)).as("h"))
    val hits = cg.join(broadcast(bg), Seq("h"))
      .groupBy(col("bench_id"))
      .agg(countDistinct(col("doc_id")).as("n_docs_hit"),
        countDistinct(col("h")).as("n_grams_hit"))
    bench.select(col("bench_id"),
        size(D.gramSet(col("bench_text"), DecontamN)).cast(LongType)
          .as("n_grams"))
      .join(hits, Seq("bench_id"), "left")
      .select(col("bench_id"), col("n_grams"),
        coalesce(col("n_docs_hit"), lit(0L)).as("n_docs_hit"),
        coalesce(col("n_grams_hit"), lit(0L)).as("n_grams_hit"))
  }

  lazy val qDecontamItemsSql: String = {
    val n = DecontamN
    def gram(ts: String) = hash60Sql(
      (0 until n).map(o => s"$ts[i+$o]").mkString(" || ' ' || "))
    val h16 = s"${hash60Sql("cast(doc_id as varchar)")} % 16"
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |b0 AS (SELECT doc_id AS bench_id, list_slice(toks, 4, 11) AS bt
       |       FROM t WHERE $h16 = 5),
       |bt AS (SELECT bench_id, list_distinct(
       |        list_transform(range(1, greatest(len(bt) - ${n - 1}, 0) + 1),
       |          i -> ${gram("bt")})) AS gs
       |       FROM b0),
       |bg AS (SELECT bench_id, unnest(gs) AS h FROM bt),
       |cg AS (SELECT doc_id, unnest(list_distinct(
       |        list_transform(range(1, greatest(len(toks) - ${n - 1}, 0) + 1),
       |          i -> ${gram("toks")}))) AS h
       |       FROM t),
       |hits AS (SELECT bg.bench_id,
       |    count(distinct cg.doc_id) AS n_docs_hit,
       |    count(distinct bg.h) AS n_grams_hit
       |  FROM cg JOIN bg USING (h) GROUP BY 1)
       |SELECT bt.bench_id,
       |  cast(len(bt.gs) as bigint) AS n_grams,
       |  cast(coalesce(h.n_docs_hit, 0) as bigint) AS n_docs_hit,
       |  cast(coalesce(h.n_grams_hit, 0) as bigint) AS n_grams_hit
       |FROM bt LEFT JOIN hits h USING (bench_id)""".stripMargin
  }

  /** Training-sequence length for [[qPackGlobal]] (tokens). ~2.3
    * docs per sequence at the synthetic doc lengths, so both
    * multi-doc sequences and boundary-crossing docs occur at every SF.
    */
  private[queries] val SeqLen = 128

  /** GLOBAL-order sequence packing (graft.ops.SeqPack) — the
    * complement of [[qSeqPack]]'s shard-local packing: the corpus
    * token stream, deterministically shuffled by hash60(doc_id) — the
    * seeded pre-training shuffle — is conceptually concatenated into
    * ONE stream and cut into [[SeqLen]]-token training sequences;
    * each doc reports its exclusive stream offset and first/last
    * sequence ids. The oracle replays the prefix sum as the textbook
    * global ORDER BY window — the one-reducer formulation the ENGINE
    * must never run (the range-shard + bounded-offsets plan is pinned
    * SinglePartition-free in PlanShapeSpec).
    */
  def qPackGlobal(s: SparkSession, d: String): DataFrame =
    graft.ops.SeqPack.pack(Tables.documents(s, d), "doc_id",
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.hash60(col("doc_id").cast(StringType)),
      seqLen = SeqLen)

  lazy val qPackGlobalSql: String = {
    val l = SeqLen
    s"""WITH t AS (SELECT doc_id, len($toksSql) AS n_toks,
       |    ${hash60Sql("cast(doc_id as varchar)")} AS k FROM documents),
       |p AS (SELECT doc_id, n_toks,
       |    cast(coalesce(sum(n_toks) OVER (ORDER BY k, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      as bigint) AS prefix
       |  FROM t)
       |SELECT doc_id, cast(n_toks as bigint) AS n_toks, prefix,
       |  prefix // $l AS seq_first,
       |  CASE WHEN n_toks > 0 THEN (prefix + n_toks - 1) // $l
       |       ELSE prefix // $l END AS seq_last,
       |  CASE WHEN n_toks > 0
       |       THEN (prefix + n_toks - 1) // $l - prefix // $l + 1
       |       ELSE 0 END AS n_seqs,
       |  CASE WHEN n_toks > 0
       |        AND (prefix + n_toks - 1) // $l > prefix // $l
       |       THEN 1 ELSE 0 END AS crosses
       |FROM p""".stripMargin
  }

  /** CROSS-RUN incremental dedup (graft.dedup.IncrementalDedup): the
    * accepted corpus's first-occurrence ownership persists as a
    * fingerprint-BUCKETED table (shuffle paid once at write), and a
    * new batch classifies against it with zero state-side exchange
    * (IncrementalDedupSpec pins the executed plan). The batch is
    * derived deterministically from the same corpus so all three
    * classifications occur: a recrawl slice (identical text, new ids
    * → dup_of_state), a fresh slice (modified text → kept), and a
    * twice-submitted slice of the fresh content (→ dup_in_batch).
    * The oracle replays the state build, the batch synthesis, and the
    * classification joins.
    */
  def qIncrDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val h = TextAnalysis.hash60(col("doc_id").cast(StringType))
    val recrawl = docs.filter(h % 4 === 1)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val fresh = docs.filter(h % 4 === 3)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" incremental v2")).as("text"))
    val dupin = docs.filter(h % 8 === 7)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat(col("text"), lit(" incremental v2")).as("text"))
    val batch = recrawl.unionByName(fresh).unionByName(dupin)
    val table = "graft_incr_state_" + d.replaceAll("[^A-Za-z0-9]", "_")
    graft.dedup.IncrementalDedup.ensureState(docs, "doc_id", "text",
      table, nBuckets = 8)
    graft.dedup.IncrementalDedup.dedupAgainst(s, table, batch,
      "doc_id", "text")
  }

  // lazy: references normSql, which is declared LATER in this object —
  // a strict val here would capture null during object init
  lazy val qIncrDedupSql: String = {
    val h = graft.ops.Sampling.hash60Sql("cast(doc_id as varchar)")
    s"""WITH batch AS (
       |  SELECT doc_id + 1000000 AS doc_id, text
       |  FROM documents WHERE $h % 4 = 1
       |  UNION ALL
       |  SELECT doc_id + 2000000 AS doc_id, text || ' incremental v2'
       |  FROM documents WHERE $h % 4 = 3
       |  UNION ALL
       |  SELECT doc_id + 3000000 AS doc_id, text || ' incremental v2'
       |  FROM documents WHERE $h % 8 = 7),
       |st AS (
       |  SELECT ${hash60Sql(normSql)} AS fp, min(doc_id) AS state_owner
       |  FROM documents GROUP BY 1),
       |b AS (SELECT doc_id, ${hash60Sql(normSql)} AS fp FROM batch),
       |bo AS (SELECT fp, min(doc_id) AS batch_owner FROM b GROUP BY 1)
       |SELECT b.doc_id, b.fp,
       |  CASE WHEN st.state_owner IS NOT NULL THEN 'dup_of_state'
       |       WHEN b.doc_id != bo.batch_owner THEN 'dup_in_batch'
       |       ELSE 'kept' END AS status,
       |  coalesce(st.state_owner, bo.batch_owner) AS owner_id
       |FROM b JOIN bo USING (fp) LEFT JOIN st USING (fp)""".stripMargin
  }

  /** CROSS-RUN incremental NEAR-dup (IncrementalDedup.nearStateOf /
    * nearDedupAgainst): the exact-fingerprint state of
    * [[qIncrDedup]] generalized to the fuzzy case — the accepted
    * corpus's MinHash-LSH band index persists BUCKETED by band key,
    * and a new batch classifies against it with zero state-side
    * exchange. The batch plants both classes: a near-recrawl slice
    * (text + a short suffix → shares buckets at high signature
    * agreement) and a fresh slice (synthetic id-derived tokens → no
    * shingle in common, no bucket hit). Borderline short docs in the
    * near slice legitimately fall under the 0.75 agreement gate —
    * both engines replay the identical arithmetic, so the
    * classification matches row for row.
    */
  def qIncrNear(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val h = TextAnalysis.hash60(col("doc_id").cast(StringType))
    val near = docs.filter(h % 4 === 1)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" trailing marker tokens appended"))
          .as("text"))
    val fresh = docs.filter(h % 8 === 6)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat_ws(" ",
          concat(lit("zq"), col("doc_id")), concat(lit("xv"), col("doc_id")),
          concat(lit("wm"), col("doc_id")), concat(lit("nk"), col("doc_id")),
          concat(lit("jp"), col("doc_id"))).as("text"))
    val batch = near.unionByName(fresh)
    val table = "graft_incr_near_" + d.replaceAll("[^A-Za-z0-9]", "_")
    graft.dedup.IncrementalDedup.ensureNearState(docs, "doc_id", "text",
      table, nBuckets = 8)
    graft.dedup.IncrementalDedup.nearDedupAgainst(s, table, batch,
      "doc_id", "text")
  }

  // lazy: references normSql-adjacent helpers declared later
  lazy val qIncrNearSql: String = {
    val h = hash60Sql("cast(doc_id as varchar)")
    val n = Dedup.minhashCoeffs.size
    val freshText = "'zq'||doc_id||' xv'||doc_id||' wm'||doc_id||" +
      "' nk'||doc_id||' jp'||doc_id"
    s"""WITH batch AS (
       |  SELECT doc_id + 1000000 AS doc_id,
       |    text || ' trailing marker tokens appended' AS text
       |  FROM documents WHERE $h % 4 = 1
       |  UNION ALL
       |  SELECT doc_id + 2000000 AS doc_id, $freshText AS text
       |  FROM documents WHERE $h % 8 = 6),
       |st AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |ssh AS (SELECT doc_id, ${shinglesSql("toks")} AS grams FROM st),
       |ssig AS (SELECT doc_id AS owner_id, ${minhashSql("grams")} AS sig
       |         FROM ssh),
       |sbuck AS (${bandSelectsSql("ssig", "owner_id")}),
       |bt AS (SELECT doc_id, $toksSql AS toks FROM batch),
       |bsh AS (SELECT doc_id, ${shinglesSql("toks")} AS grams FROM bt),
       |bsig AS (SELECT doc_id, ${minhashSql("grams")} AS sig FROM bsh),
       |bbuck AS (${bandSelectsSql("bsig", "doc_id")}),
       |cand AS (SELECT b.doc_id, s.owner_id,
       |    round(len(list_filter(range(1, $n + 1),
       |      i -> b.sig[i] = s.sig[i])) * 1.0 / $n, 6) AS agree
       |  FROM bbuck b JOIN sbuck s ON b.bucket = s.bucket),
       |q AS (SELECT doc_id, owner_id, agree,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY agree DESC, owner_id ASC) AS rn
       |  FROM cand WHERE agree >= 0.75),
       |b1 AS (SELECT doc_id, owner_id, agree FROM q WHERE rn = 1)
       |SELECT b.doc_id,
       |  CASE WHEN b1.owner_id IS NOT NULL THEN 'near_dup_of_state'
       |       ELSE 'kept' END AS status,
       |  coalesce(b1.owner_id, -1) AS owner_id,
       |  coalesce(b1.agree, 0.0) AS best_agreement
       |FROM batch b LEFT JOIN b1 USING (doc_id)""".stripMargin
  }

  /** LEARNED quality classifier (graft.text.QualityClassifier):
    * 10 rounds of quantized-integer batch gradient descent distilling
    * the heuristic composite gate (quality ≥ 0.65) into a linear
    * scorer — one feature projection + dot product replaces ~5
    * tokenizer passes at apply time. The oracle replays EVERY
    * training round in DuckDB: the same micro-unit features, the same
    * exact long gradient sums, the same algebraic sigmoid (rational
    * arithmetic only — no transcendental whose last ulp could flip a
    * quantization round), the same HALF_UP weight updates — so the
    * per-document scores hash-match only if the full 10-round
    * trajectory is bit-identical.
    */
  def qClassifier(s: SparkSession, d: String): DataFrame =
    graft.text.QualityClassifier.fitScore(
      Tables.documents(s, d), col("text"),
      (TextAnalysis.qualityScore(col("text")) >= 0.65).cast(IntegerType),
      keep = Seq(col("doc_id")))

  val qClassifierSql: String = {
    import graft.text.{QualityClassifier => QC}
    val nd = QC.NumFeatures
    val stops = inList(TextAnalysis.defaultStopwords)
    val stopR = s"round(CASE WHEN len(toks) > 0 THEN " +
      s"len(list_filter(toks, x -> x IN $stops)) * 1.0 / len(toks) " +
      "ELSE 0.0 END, 6)"
    val punctR = "round(CASE WHEN length(text) > 0 THEN " +
      "length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) * 1.0" +
      " / length(text) ELSE 0.0 END, 6)"
    val digitR = "round(CASE WHEN length(text) > 0 THEN " +
      "length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0" +
      " / length(text) ELSE 0.0 END, 6)"
    val mtl = "round(CASE WHEN len(toks) > 0 THEN " +
      "length(regexp_replace(text, '\\s', '', 'g')) * 1.0 / len(toks) " +
      "ELSE 0.0 END, 6)"
    val feats = Seq("1.0", stopR, "least(len(toks) / 100.0, 1.0)",
      punctR, digitR, s"least($mtl / 10.0, 1.0)")
    def sig(z: String) = s"(0.5 + $z / (2.0 * (1.0 + abs($z))))"
    def zed(w: String) = (0 until nd).map(i => s"$w.w$i * f.f$i")
      .mkString(" + ")
    val sb = new StringBuilder
    sb ++= s"WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),\n"
    sb ++= "f AS (SELECT doc_id,\n  " + feats.zipWithIndex.map {
      case (f, i) => s"cast(round(($f) * ${QC.Scale}) as bigint) AS f$i"
    }.mkString(",\n  ")
    sb ++= s",\n  CASE WHEN ${qualityExprSql("toks", "text")} >= 0.65 " +
      "THEN 1 ELSE 0 END AS y\nFROM t),\n"
    sb ++= "w0 AS (SELECT " + (0 until nd).map(i =>
      s"cast(0 as bigint) AS w$i").mkString(", ") + "),\n"
    for (r <- 1 to QC.Iters) {
      sb ++= s"z$r AS (SELECT f.*, cast((${zed("w")}) as double)" +
        s" / 1000000000000.0 AS z FROM f CROSS JOIN w${r - 1} w),\n"
      sb ++= s"g$r AS (SELECT count(*) AS n,\n  " + (0 until nd).map(i =>
        s"sum(cast(round((${sig("z")} - y) * f$i) as bigint)) AS g$i")
        .mkString(",\n  ") + s"\nFROM z$r),\n"
      sb ++= s"w$r AS (SELECT " + (0 until nd).map(i =>
        s"w.w$i - cast(round(${QC.Lr} * g.g$i / g.n) as bigint) AS w$i")
        .mkString(",\n  ") + s" FROM w${r - 1} w CROSS JOIN g$r g),\n"
    }
    sb ++= s"sc AS (SELECT f.doc_id, f.y, round(${sig("z")}, 6) AS score\n" +
      s"FROM (SELECT f.*, cast((${zed("w")}) as double)" +
      s" / 1000000000000.0 AS z FROM f CROSS JOIN w${QC.Iters} w) f)\n"
    sb ++= "SELECT doc_id, y, score, " +
      "CASE WHEN score >= 0.5 THEN 1 ELSE 0 END AS pred FROM sc"
    sb.toString
  }

  /** Language ID: marker-word votes + argmax (first-wins tiebreak). */
  def qLangId(s: SparkSession, d: String): DataFrame = {
    val scores = TextAnalysis.langMarkers.map { case (lang, ms) =>
      TextAnalysis.langScore(col("text"), ms).as(s"score_$lang")
    }
    Tables.documents(s, d).select(
      (col("doc_id") +: col("lang").as("labeled") +: scores) :+
        TextAnalysis.langId(col("text")).as("predicted"): _*)
  }

  val qLangIdSql: String = {
    val scoreExprs = TextAnalysis.langMarkers.map { case (lang, ms) =>
      s"len(list_filter(toks, x -> x IN ${inList(ms)})) AS score_$lang"
    }.mkString(",\n  ")
    val names = TextAnalysis.langMarkers.map { case (lang, _) => s"score_$lang" }
    val best = s"greatest(${names.mkString(", ")})"
    val caseChain = TextAnalysis.langMarkers.map { case (lang, _) =>
      s"WHEN score_$lang = $best AND $best > 0 THEN '$lang'"
    }.mkString("\n    ")
    s"""WITH t AS (SELECT doc_id, lang AS labeled, $toksSql AS toks FROM documents),
       |s AS (SELECT doc_id, labeled,
       |  $scoreExprs
       |FROM t)
       |SELECT doc_id, labeled, ${names.mkString(", ")},
       |  CASE $caseChain ELSE 'und' END AS predicted
       |FROM s""".stripMargin
  }

  /** PII redaction + span counting — the scrub stage of the curation
    * pipeline. Patterns apply in a fixed order; the oracle runs the
    * same POSIX regex chain.
    */
  def qPiiRedact(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.redactPii(col("text")).as("redacted"),
      TextAnalysis.piiCount(col("text")).as("n_pii"))

  val qPiiRedactSql: String = {
    // DuckDB single-quoted strings take backslashes literally — the
    // regex text passes through verbatim (only quotes need escaping)
    def q(pat: String) = pat.replace("'", "''")
    val chain = TextAnalysis.piiPatterns.foldLeft("text") {
      case (acc, (pat, repl)) =>
        s"regexp_replace($acc, '${q(pat)}', '$repl', 'g')"
    }
    val counts = TextAnalysis.piiPatterns.map { case (pat, _) =>
      s"len(regexp_extract_all(text, '${q(pat)}'))"
    }.mkString(" + ")
    s"""SELECT doc_id, $chain AS redacted, $counts AS n_pii
       |FROM documents""".stripMargin
  }

  /** Document fingerprinting: md5 hex + portable 60-bit integer of the
    * normalized content.
    */
  def qFingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.fingerprintHex(col("text")).as("fp_hex"),
      TextAnalysis.fingerprint60(col("text")).as("fp60"))

  private[queries] val normSql = """trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"""
  val qFingerprintSql: String =
    s"""SELECT doc_id,
       |  md5($normSql) AS fp_hex,
       |  ${hash60Sql(normSql)} AS fp60
       |FROM documents""".stripMargin

  /** DuckDB: the composite quality score of (toks, text) expressions —
    * the single-expression form of qTextQualitySql's staged version
    * (same arithmetic, same rounding).
    */
  private[queries] def qualityExprSql(toks: String, text: String): String = {
    val stops = inList(TextAnalysis.defaultStopwords)
    s"""round((
       |  least(len($toks) / 100.0, 1.0) +
       |  least(round(CASE WHEN len($toks) > 0
       |    THEN len(list_filter($toks, x -> x IN $stops)) * 1.0 / len($toks)
       |    ELSE 0.0 END, 6) * 4.0, 1.0) +
       |  greatest(1.0 - round(CASE WHEN length($text) > 0
       |    THEN length(regexp_replace(lower($text), '[a-z0-9 ]', '', 'g')) * 1.0 / length($text)
       |    ELSE 0.0 END, 6) * 4.0, 0.0) +
       |  greatest(1.0 - round(CASE WHEN length($text) > 0
       |    THEN length(regexp_replace($text, '[^0-9]', '', 'g')) * 1.0 / length($text)
       |    ELSE 0.0 END, 6) * 4.0, 0.0)
       |) / 4.0, 6)""".stripMargin
  }

  /** DuckDB: predicted language of a token-list expression (inline
    * twin of qLangIdSql's staged CASE — same first-wins tie-break).
    */
  private[queries] def predictedLangSql(toks: String): String = {
    def score(ms: Seq[String]) =
      s"len(list_filter($toks, x -> x IN ${inList(ms)}))"
    val best = s"greatest(${TextAnalysis.langMarkers.map(m => score(m._2)).mkString(", ")})"
    val chain = TextAnalysis.langMarkers.map { case (lang, ms) =>
      s"WHEN ${score(ms)} = $best AND $best > 0 THEN '$lang'"
    }.mkString(" ")
    s"CASE $chain ELSE 'und' END"
  }

  /** CAPSTONE: the curation pipeline end-to-end — language gate →
    * quality gate → MinHash near-dedup → deterministic split — as ONE
    * composed, hash-verified query. Demonstrates that every stage
    * (each verified alone) composes without breaking cross-engine
    * determinism.
    */
  def qCorpusPipeline(s: SparkSession, d: String): DataFrame = {
    import graft.text.{TextAnalysis => TA}
    val kept = Tables.documents(s, d)
      .filter(TA.langId(col("text")) === "en" &&
        TA.qualityScore(col("text")) >= 0.65)
    val deduped = Dedup.dropNearDuplicates(kept, "doc_id", "text")
    graft.ops.Sampling.deterministicSplit(deduped, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
  }

  val qCorpusPipelineSql: String = {
    val bandSelects = bandSelectsSql("sigs", "doc_id")
    val u = graft.ops.Sampling.coordinateSql("doc_id")
    s"""WITH t0 AS (SELECT doc_id, source, n_chars, text, $toksSql AS toks
       |            FROM documents),
       |kept AS (
       |  SELECT doc_id, source, n_chars, text, toks FROM t0
       |  WHERE ${predictedLangSql("toks")} = 'en'
       |    AND ${qualityExprSql("toks", "text")} >= 0.65),
       |reps AS (
       |  SELECT min(doc_id) AS doc_id FROM kept GROUP BY md5($normSql)),
       |sh AS (SELECT doc_id, source, n_chars, ${shinglesSql("toks")} AS grams
       |       FROM kept WHERE doc_id IN (SELECT doc_id FROM reps)),
       |sigs AS (SELECT doc_id, ${minhashSql("grams")} AS sig FROM sh),
       |buckets AS ($bandSelects),
       |drops AS (
       |  SELECT DISTINCT b.doc_id
       |  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
       |  WHERE len(list_filter(range(1, ${Dedup.minhashCoeffs.size} + 1),
       |        i -> a.sig[i] = b.sig[i])) * 1.0 / ${Dedup.minhashCoeffs.size} >= 0.75),
       |final AS (
       |  SELECT doc_id, source, n_chars,
       |    CASE WHEN $u < 0.8 THEN 'train'
       |         WHEN $u < ${0.8 + 0.1} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM sh WHERE doc_id NOT IN (SELECT doc_id FROM drops))
       |SELECT source, split, count(*) AS n,
       |  cast(sum(n_chars) as bigint) AS chars
       |FROM final GROUP BY 1, 2""".stripMargin
  }

  /** ROUND-5 CAPSTONE: the quality stack composed — composite quality
    * score AND unigram-LM perplexity proxy AND cross-document
    * boilerplate (span dup fraction) gates, aggregated per source.
    * Each signal is hash-verified alone (q_text_quality, q_unigram_lm,
    * q_span_dedup); this pins that they compose without breaking
    * cross-engine determinism (every gate compares the same ROUNDED
    * value in both engines, so thresholds cut identically).
    */
  def qCurationV2(s: SparkSession, d: String): DataFrame = {
    import graft.text.{TextAnalysis => TA}
    val docs = Tables.documents(s, d)
    val lmKeep = graft.text.UnigramLm.score(docs, "doc_id", "text")
      .filter(col("avg_logp") >= -3.41).select("doc_id")
    val spKeep = Dedup.spanProfile(docs, "doc_id", "text", w = 6, minDocs = 2)
      .filter(col("dup_frac") <= 0.3).select("doc_id")
    docs
      .filter(TA.qualityScore(col("text")) >= 0.6)
      .join(lmKeep, Seq("doc_id"))
      .join(spKeep, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("chars"))
  }

  /** Curation v3 — the REWRITE-first stack: scrub cross-document
    * duplicated spans (boilerplate removal, `q_span_scrub`'s operator),
    * drop documents left with < 10 tokens, re-score quality on the
    * CLEANED text (scoring the original would credit boilerplate
    * length), and gate at ≥ 0.65. Keeps 337/500 at sf0.01. Composes
    * round-8's scrub with the quality kernel; the oracle replays
    * scrub → re-tokenize → re-score → gate end to end.
    */
  def qCurationV3(s: SparkSession, d: String): DataFrame =
    Dedup.scrubDuplicateSpans(Tables.documents(s, d), "doc_id", "text",
      w = 6, minDocs = 2)
      .filter(col("n_kept") >= 10)
      .withColumn("quality",
        graft.text.TextAnalysis.qualityScore(col("text_clean")))
      .filter(col("quality") >= 0.65)
      .select(col("doc_id"), col("n_kept"), col("n_dropped"), col("quality"))

  // lazy: qSpanScrubSql is declared later in the object, so an eager
  // val here would capture null at initialization
  lazy val qCurationV3Sql: String =
    s"""WITH s AS ($qSpanScrubSql),
       |t AS (SELECT doc_id, text_clean AS text, $toksSql AS toks,
       |        n_kept, n_dropped
       |      FROM s WHERE n_kept >= 10),
       |w AS (SELECT doc_id, n_kept, n_dropped,
       |        ${qualityExprSql("toks", "text")} AS quality FROM t)
       |SELECT doc_id, n_kept, n_dropped, quality
       |FROM w WHERE quality >= 0.65""".stripMargin

  /** Curation v4 — the STRUCTURAL stack composed from this round's
    * operators: exact duplicate-paragraph removal with reassembly
    * (`q_para_dedup`'s operator — boilerplate cells vanish corpus-wide,
    * each document keeps its unique content), token floor, quality
    * re-scored on the DEDUPED text, then a per-source [p05, p95]
    * sketch-quantile length band that TRIMS outliers (a row passes iff
    * the winsorize clamp is the identity on it). Output: per-source
    * kept-document and kept-character counts. The oracle replays
    * paragraph dedup → re-tokenize → re-score → histogram band → trim
    * end to end.
    */
  def qCurationV4(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pd = graft.dedup.ParagraphDedup.dedupParagraphs(
      docs, "doc_id", "text", " the ")
    val scored = pd
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .filter(TextAnalysis.tokenCount(col("text_dedup")) >= 5)
      .withColumn("quality", TextAnalysis.qualityScore(col("text_dedup")))
      .filter(col("quality") >= 0.55)
      .withColumn("len_clean", length(col("text_dedup")))
    graft.sketch.QuantileHist.winsorize(scored, Seq("source"), "len_clean",
      lo = 0.0, hi = 600.0, nBins = 64, pLo = 0.05, pHi = 0.95)
      .filter(col("len_clean").cast("double") === col("len_clean_w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("len_clean")).cast("long").as("chars"))
  }

  // lazy: composes qParaDedupSql, declared later in the object
  lazy val qCurationV4Sql: String = {
    val est = graft.sketch.QuantileHist.quantileOracleSql(
      "(SELECT source, len_clean AS n_chars FROM sv) qsrc",
      "source", "n_chars", 0.0, 600.0, 64, Seq(0.05, 0.95))
    s"""WITH pd AS ($qParaDedupSql),
       |j AS (SELECT p.doc_id, d.source, p.text_dedup AS text
       |      FROM pd p JOIN documents d USING (doc_id)),
       |t AS (SELECT doc_id, source, text, $toksSql AS toks FROM j),
       |g AS (SELECT * FROM t WHERE len(toks) >= 5),
       |q AS (SELECT doc_id, source, length(text) AS len_clean,
       |        ${qualityExprSql("toks", "text")} AS quality FROM g),
       |sv AS (SELECT doc_id, source, len_clean FROM q
       |       WHERE quality >= 0.55),
       |est AS ($est),
       |b AS (SELECT source,
       |        max(CASE WHEN q = 0.05 THEN est END) AS lo_w,
       |        max(CASE WHEN q = 0.95 THEN est END) AS hi_w
       |      FROM est GROUP BY 1)
       |SELECT sv.source, count(*) AS n_kept,
       |  cast(sum(sv.len_clean) as bigint) AS chars
       |FROM sv JOIN b USING (source)
       |WHERE least(greatest(cast(sv.len_clean as double), b.lo_w), b.hi_w)
       |      = cast(sv.len_clean as double)
       |GROUP BY 1""".stripMargin
  }

  val qCurationV2Sql: String = {
    val sc = graft.text.UnigramLm.Scale
    s"""WITH t AS (SELECT doc_id, source, n_chars, text, $toksSql AS toks
       |           FROM documents),
       |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |v AS (SELECT tok, count(*) AS c FROM u GROUP BY tok),
       |tot AS (SELECT cast(sum(c) as bigint) AS tt FROM v),
       |q AS (SELECT tok,
       |        cast(round(ln(cast(c as double) / cast(tt as double)) * $sc) as bigint) AS lp
       |      FROM v CROSS JOIN tot),
       |p AS (SELECT u.doc_id, count(*) AS n_tokens, cast(sum(q.lp) as bigint) AS slp
       |      FROM u JOIN q USING (tok) GROUP BY u.doc_id),
       |lmkeep AS (
       |  SELECT t.doc_id FROM t LEFT JOIN p USING (doc_id)
       |  WHERE round(CASE WHEN p.n_tokens > 0
       |        THEN cast(p.slp as double) / p.n_tokens / $sc.0
       |        ELSE 0.0 END, 6) >= -3.41),
       |su AS (SELECT doc_id, unnest(${shinglesWSql("toks", 6)}) AS h FROM t),
       |sf AS (SELECT h, count(*) AS nd FROM su GROUP BY h),
       |sp AS (SELECT su.doc_id, count(*) AS n_spans,
       |         cast(sum(CASE WHEN sf.nd >= 2 THEN 1 ELSE 0 END) as bigint) AS n_dup
       |       FROM su JOIN sf USING (h) GROUP BY su.doc_id),
       |spkeep AS (
       |  SELECT t.doc_id FROM t LEFT JOIN sp USING (doc_id)
       |  WHERE round(CASE WHEN sp.n_spans > 0 THEN sp.n_dup * 1.0 / sp.n_spans
       |        ELSE 0.0 END, 6) <= 0.3),
       |kept AS (
       |  SELECT t.source, t.n_chars FROM t
       |  WHERE ${qualityExprSql("toks", "text")} >= 0.6
       |    AND doc_id IN (SELECT doc_id FROM lmkeep)
       |    AND doc_id IN (SELECT doc_id FROM spkeep))
       |SELECT source, count(*) AS n_kept, cast(sum(n_chars) as bigint) AS chars
       |FROM kept GROUP BY 1""".stripMargin
  }

  /** Deterministic 80/10/10 split assignment by content-hash
    * coordinate: per-(source, split) counts — identical in any engine
    * (the property that keeps train/val/test membership stable).
    */
  def qSplitAssign(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.deterministicSplit(
      Tables.documents(s, d), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n"))

  val qSplitAssignSql: String = {
    val u = graft.ops.Sampling.coordinateSql("doc_id")
    s"""SELECT source,
       |  CASE WHEN $u < 0.8 THEN 'train'
       |       WHEN $u < ${0.8 + 0.1} THEN 'val'
       |       ELSE 'test' END AS split,
       |  count(*) AS n
       |FROM documents GROUP BY 1, 2""".stripMargin
  }

  /** Stratified deterministic sampling: per-source keep rates (throttle
    * src0 to 5%, keep src2 at 75%, everything else at the 50% default)
    * — the training-mixture control knob, hash-stable row-for-row
    * across engines and re-runs. A pure narrow filter: no shuffle.
    */
  def qStratSample(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.stratifiedSample(
      Tables.documents(s, d).select(col("doc_id"), col("source")),
      "doc_id", "source",
      Map("src0" -> 0.05, "src1" -> 0.25, "src2" -> 0.75),
      defaultRate = 0.5)

  val qStratSampleSql: String = {
    val u = graft.ops.Sampling.coordinateSql("doc_id")
    s"""SELECT doc_id, source FROM documents
       |WHERE $u < CASE WHEN source = 'src0' THEN 0.05
       |                WHEN source = 'src1' THEN 0.25
       |                WHEN source = 'src2' THEN 0.75
       |                ELSE 0.5 END""".stripMargin
  }

  /** Exactly-8-docs-per-language deterministic sample
    * ([[graft.ops.Sampling.groupSample]]): the count-bounded eval-set
    * carve, computed with the bounded per-group heap aggregate — no
    * per-group window sort in the Spark plan (the oracle replays it AS
    * the row_number window because the oracle runs at test scale).
    */
  def qGroupSample(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.groupSample(
      Tables.documents(s, d).select(col("doc_id"), col("lang")),
      "doc_id", Seq("lang"), n = 8)

  val qGroupSampleSql: String = {
    val hv = graft.ops.Sampling.hash60Sql("cast(doc_id as varchar)")
    s"""WITH r AS (
       |  SELECT lang, doc_id, $hv AS hv,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY $hv DESC, doc_id ASC) AS rnk
       |  FROM documents)
       |SELECT lang, cast(rnk as bigint) AS rnk, doc_id
       |FROM r WHERE rnk <= 8""".stripMargin
  }

  /** Neyman-allocation stratified sample: a 400-doc budget split
    * across sources ∝ N_h·σ_h of document length (n_chars) — the
    * minimum-variance eval carve (high-variance sources earn more of
    * the budget than size alone would give), then each stratum's
    * allocation drawn with the deterministic hash-order heap. Exact
    * integer moments → one sqrt → integer micro-unit weights →
    * floor-division allocation: every step cross-engine exact
    * ([[graft.ops.Sampling.neymanSample]]).
    */
  def qNeyman(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.neymanSample(
      Tables.documents(s, d).select(col("doc_id"), col("source"),
        col("n_chars")),
      "doc_id", "source", "n_chars", total = 400)

  val qNeymanSql: String = {
    val hv = graft.ops.Sampling.hash60Sql("cast(doc_id as varchar)")
    s"""WITH s AS (SELECT source, count(*) AS n_h,
       |    cast(sum(n_chars) as bigint) AS s1,
       |    cast(sum(n_chars * n_chars) as bigint) AS s2
       |  FROM documents GROUP BY source),
       |v AS (SELECT source, n_h,
       |    CASE WHEN n_h > 1 THEN sqrt(
       |      (cast(s2 as double) -
       |       cast(s1 as double) * cast(s1 as double) / cast(n_h as double))
       |      / (cast(n_h as double) - 1.0)) ELSE 0.0 END AS sigma
       |  FROM s),
       |w2 AS (SELECT source, n_h, sigma,
       |    cast(round(cast(n_h as double) * sigma * 1000000.0) as bigint) AS w
       |  FROM v),
       |wt AS (SELECT cast(sum(w) as bigint) AS w_tot FROM w2),
       |a AS (SELECT source, n_h, sigma, w,
       |    CASE WHEN w_tot > 0
       |      THEN least(n_h, (cast(400 as bigint) * w) // w_tot)
       |      ELSE cast(0 as bigint) END AS alloc
       |  FROM w2 CROSS JOIN wt),
       |r AS (SELECT source, doc_id, row_number() OVER (
       |    PARTITION BY source ORDER BY $hv DESC, doc_id ASC) AS rnk
       |  FROM documents)
       |SELECT a.source, a.n_h, round(a.sigma, 6) AS sigma, a.w, a.alloc,
       |  cast(r.rnk as bigint) AS rnk, r.doc_id
       |FROM r JOIN a USING (source) WHERE r.rnk <= a.alloc""".stripMargin
  }

  /** Per-domain token-budget fill: within each source, documents are
    * taken quality-best-first until a 700-token budget is exhausted —
    * how a training mixture is actually cut (a document-count cut
    * over/under-shoots by orders of magnitude because document length
    * varies). The first document that would overflow the budget is
    * dropped along with everything ranked below it; `cum_cost` is the
    * running token total including the row. The oracle replays the
    * same running-sum window, so the prefix semantics (ties broken by
    * doc_id, ≤ boundary inclusive) are hash-pinned.
    */
  def qTokenBudget(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.documents(s, d).select(
      col("doc_id"), col("source"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    graft.ops.BudgetFill.fill(scored, Seq("source"), "n_tokens",
      Seq(col("quality").desc, col("doc_id").asc), budget = 700.0)
  }

  val qTokenBudgetSql: String =
    s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
       |w AS (SELECT doc_id, source, cast(len(toks) as bigint) AS n_tokens,
       |        ${qualityExprSql("toks", "text")} AS quality FROM t),
       |c AS (
       |  SELECT doc_id, source, n_tokens, quality,
       |    cast(sum(n_tokens) OVER (PARTITION BY source
       |      ORDER BY quality DESC, doc_id) as bigint) AS cum_cost
       |  FROM w)
       |SELECT doc_id, source, n_tokens, quality, cum_cost
       |FROM c WHERE cum_cost <= 700""".stripMargin

  /** Intra-document repetition ratio (1 − distinct/total 3-shingles) —
    * the Gopher-style repeated-phrase quality signal.
    */
  def qRepetition(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.repetitionRatio(col("text")).as("rep_ratio"))

  val qRepetitionSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents)
       |SELECT doc_id, len(toks) AS n_tokens,
       |  round(CASE WHEN greatest(len(toks) - 2, 0) > 0
       |    THEN 1.0 - len(${shinglesSql("toks")}) * 1.0 / greatest(len(toks) - 2, 0)
       |    ELSE 0.0 END, 6) AS rep_ratio
       |FROM t""".stripMargin

  /** Self-trained unigram-LM scoring — the perplexity-proxy quality
    * filter: per-document mean token log-probability under the
    * corpus's own unigram distribution. Quantized per-token
    * log-probs make even this float-heavy score hash-verifiable.
    */
  def qUnigramLm(s: SparkSession, d: String): DataFrame =
    graft.text.UnigramLm.score(Tables.documents(s, d), "doc_id", "text")

  val qUnigramLmSql: String = {
    val sc = graft.text.UnigramLm.Scale
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
       |v AS (SELECT tok, count(*) AS c FROM u GROUP BY tok),
       |tot AS (SELECT cast(sum(c) as bigint) AS tt FROM v),
       |q AS (SELECT tok,
       |        cast(round(ln(cast(c as double) / cast(tt as double)) * $sc) as bigint) AS lp
       |      FROM v CROSS JOIN tot),
       |p AS (SELECT u.doc_id, count(*) AS n_tokens, cast(sum(q.lp) as bigint) AS slp
       |      FROM u JOIN q USING (tok) GROUP BY u.doc_id)
       |SELECT d.doc_id,
       |  coalesce(p.n_tokens, 0) AS n_tokens,
       |  round(CASE WHEN p.n_tokens > 0
       |        THEN cast(p.slp as double) / p.n_tokens / $sc.0
       |        ELSE 0.0 END, 6) AS avg_logp
       |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin
  }

  /** Classifier calibration audit — the reliability-diagram bins an
    * ML data pipeline checks before trusting a learned gate: decile
    * bins of the trained scorer's output vs the realized label rate.
    * Reuses [[qClassifier]]'s training verbatim (same corpus, same
    * label → identical 10-round trajectory), so the oracle composes
    * that replay and adds only the binning.
    */
  def qCalibration(s: SparkSession, d: String): DataFrame = {
    val scored = graft.text.QualityClassifier.fitScore(
      Tables.documents(s, d), col("text"),
      (TextAnalysis.qualityScore(col("text")) >= 0.65).cast(IntegerType),
      keep = Seq(col("doc_id")))
    scored
      .withColumn("bin", least(floor(col("score") * 10), lit(9.0))
        .cast(LongType))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("y").cast(LongType)).as("n_pos"),
        // score is 6-dp-rounded; exact micro-integer mean
        round(sum(round(col("score") * 1e6).cast(LongType))
          .cast(DoubleType) / count(lit(1)) / 1e6, 6).as("mean_score"),
        round(sum(col("y").cast(LongType)).cast(DoubleType) /
          count(lit(1)), 6).as("pos_rate"))
  }

  lazy val qCalibrationSql: String =
    s"""WITH clf AS (
       |$qClassifierSql)
       |SELECT cast(least(floor(score * 10), 9) as bigint) AS bin,
       |  count(*) AS n,
       |  cast(sum(y) as bigint) AS n_pos,
       |  round(cast(sum(cast(round(score * 1000000) as bigint)) as double)
       |    / count(*) / 1000000, 6) AS mean_score,
       |  round(cast(sum(y) as double) / count(*), 6) AS pos_rate
       |FROM clf GROUP BY 1""".stripMargin

  /** ROC-AUC of the trained scorer ([[qClassifier]]'s exact 10-round
    * trajectory) against its training label — the one-number ranking
    * audit next to [[qCalibration]]'s reliability bins: calibration
    * says the probabilities are honest, AUC says the ORDERING separates
    * classes (a miscalibrated-but-high-AUC scorer is rescuable by
    * thresholding; a low-AUC one is not). Computed by the tie-aware
    * Mann–Whitney rank statistic over the score-quantization-bounded
    * aggregate ([[graft.ops.RankMetrics.binaryAuc]]) — no global row
    * sort at any scale. The oracle replays training AND the same exact
    * 2R-integer rank arithmetic, so the single emitted double is pinned
    * to the last ulp.
    */
  def qAuc(s: SparkSession, d: String): DataFrame = {
    val scored = graft.text.QualityClassifier.fitScore(
      Tables.documents(s, d), col("text"),
      (TextAnalysis.qualityScore(col("text")) >= 0.65).cast(IntegerType),
      keep = Seq(col("doc_id")))
    graft.ops.RankMetrics.binaryAuc(scored, col("score"), col("y"))
  }

  lazy val qAucSql: String =
    s"""WITH clf AS (
       |$qClassifierSql),
       |g AS (SELECT score, count(*) AS n, cast(sum(y) as bigint) AS p
       |      FROM clf GROUP BY 1),
       |r AS (SELECT p, n,
       |        coalesce(sum(n) OVER (ORDER BY score
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |          AS cumb
       |      FROM g),
       |a AS (SELECT cast(sum(p * (cumb * 2 + n + 1)) as bigint) AS r2,
       |        cast(sum(p) as bigint) AS n_pos,
       |        cast(sum(n - p) as bigint) AS n_neg
       |      FROM r)
       |SELECT n_pos, n_neg,
       |  round(cast(r2 - n_pos * (n_pos + 1) as double) /
       |    cast(n_pos * n_neg * 2 as double), 6) AS auc,
       |  round(cast(r2 - n_pos * (n_pos + 1) as double) /
       |    cast(n_pos * n_neg as double) - 1.0, 6) AS gini
       |FROM a""".stripMargin

  /** Average precision (PR-AUC) of the trained scorer — the
    * imbalance-honest companion to [[qAuc]]: ROC-AUC stays high when
    * the positive class is rare and the ranking merely avoids
    * catastrophe; AP weights every step by precision at that recall,
    * which is what a curation gate actually trades on. Distinct-score
    * threshold granularity (sklearn step-sum semantics — a threshold
    * cannot split a tied group), computed over the same
    * score-quantization-bounded frame as [[qAuc]] with nano-unit
    * exact summation ([[graft.ops.RankMetrics.averagePrecision]]).
    */
  def qPrAuc(s: SparkSession, d: String): DataFrame = {
    val scored = graft.text.QualityClassifier.fitScore(
      Tables.documents(s, d), col("text"),
      (TextAnalysis.qualityScore(col("text")) >= 0.65).cast(IntegerType),
      keep = Seq(col("doc_id")))
    graft.ops.RankMetrics.averagePrecision(scored, col("score"), col("y"))
  }

  lazy val qPrAucSql: String =
    s"""WITH clf AS (
       |$qClassifierSql),
       |g AS (SELECT score, count(*) AS n, cast(sum(y) as bigint) AS p
       |      FROM clf GROUP BY 1),
       |c AS (SELECT p, n,
       |        sum(p) OVER (ORDER BY score DESC
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          AS cum_tp,
       |        sum(n) OVER (ORDER BY score DESC
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |          AS cum_n,
       |        sum(p) OVER () AS tot_p,
       |        sum(n) OVER () AS tot_n
       |      FROM g),
       |t AS (SELECT tot_p, tot_n,
       |        cast(round(cast(p as double) / cast(tot_p as double) *
       |          (cast(cum_tp as double) / cast(cum_n as double)) *
       |          1000000000.0) as bigint) AS nano
       |      FROM c)
       |SELECT cast(max(tot_p) as bigint) AS n_pos,
       |  cast(max(tot_n - tot_p) as bigint) AS n_neg,
       |  round(cast(sum(nano) as double) / 1000000000.0, 6) AS ap
       |FROM t""".stripMargin

  /** Token-distribution drift — the JSD complement of [[qDrift]]'s
    * per-feature histogram drift: per-token Jensen–Shannon divergence
    * contributions between the accepted corpus and a drifted snapshot
    * (planted deterministically: every doc gains two copies of its
    * source token, shifting mass toward source names). Per-token
    * terms quantize to nano-nats (the UnigramLm
    * ln-on-exact-rationals discipline) and sum exactly; every frame
    * after the two token counts is VOCAB-sized.
    */
  def qTokenDrift(s: SparkSession, d: String): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    val docs = Tables.documents(s, d)
    val drifted = docs.select(concat(col("text"), lit(" "),
      col("source"), lit(" "), col("source")).as("text"))
    def counts(df: DataFrame, as: String) = df
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as(as))
    val v = counts(docs, "c_old")
      .join(counts(drifted, "c_new"), Seq("tok"), "full_outer")
      .select(col("tok"),
        coalesce(col("c_old"), lit(0L)).as("c_old"),
        coalesce(col("c_new"), lit(0L)).as("c_new"))
    val np = sum(col("c_old")).over(all).cast(DoubleType)
    val nq = sum(col("c_new")).over(all).cast(DoubleType)
    val pd = col("c_old").cast(DoubleType) / np
    val qd = col("c_new").cast(DoubleType) / nq
    val md = (pd + qd) / 2.0d
    val klp = when(col("c_old") > 0L, pd * log(pd / md)).otherwise(0.0d)
    val klq = when(col("c_new") > 0L, qd * log(qd / md)).otherwise(0.0d)
    val contrib = round((klp + klq) * 0.5d * 1.0e9d).cast(LongType)
    v.withColumn("contrib_nano", contrib)
      .withColumn("p_old", round(pd, 6))
      .withColumn("p_new", round(qd, 6))
      .withColumn("jsd",
        round(sum(col("contrib_nano")).over(all).cast(DoubleType) / 1.0e9d,
          6))
      .select(col("tok"), col("c_old"), col("c_new"), col("p_old"),
        col("p_new"), col("contrib_nano"), col("jsd"))
  }

  val qTokenDriftSql: String =
    s"""WITH od AS (SELECT text FROM documents),
       |nd AS (SELECT text || ' ' || source || ' ' || source AS text
       |       FROM documents),
       |co AS (SELECT u.tok, count(*) AS c_old
       |       FROM (SELECT unnest($toksSql) AS tok FROM od) u GROUP BY 1),
       |cn AS (SELECT u.tok, count(*) AS c_new
       |       FROM (SELECT unnest($toksSql) AS tok FROM nd) u GROUP BY 1),
       |v AS (SELECT coalesce(co.tok, cn.tok) AS tok,
       |        cast(coalesce(co.c_old, 0) as bigint) AS c_old,
       |        cast(coalesce(cn.c_new, 0) as bigint) AS c_new
       |      FROM co FULL OUTER JOIN cn ON co.tok = cn.tok),
       |w AS (SELECT tok, c_old, c_new,
       |        cast(c_old as double) / cast(sum(c_old) OVER () as double) AS pd,
       |        cast(c_new as double) / cast(sum(c_new) OVER () as double) AS qd
       |      FROM v),
       |k AS (SELECT tok, c_old, c_new, pd, qd,
       |        cast(round(((CASE WHEN c_old > 0
       |            THEN pd * ln(pd / ((pd + qd) / 2.0)) ELSE 0.0 END) +
       |          (CASE WHEN c_new > 0
       |            THEN qd * ln(qd / ((pd + qd) / 2.0)) ELSE 0.0 END))
       |          * 0.5 * 1000000000.0) as bigint) AS contrib_nano
       |      FROM w)
       |SELECT tok, c_old, c_new,
       |  round(pd, 6) AS p_old, round(qd, 6) AS p_new, contrib_nano,
       |  round(cast(sum(contrib_nano) OVER () as double) / 1000000000.0, 6)
       |    AS jsd
       |FROM k""".stripMargin

  /** DoReMi-style domain mixture optimization
    * (graft.ops.MixtureOptimizer): per-doc unigram-LM losses
    * (quantized micro-nats, the [[qUnigramLm]] machinery) aggregate
    * to per-source mean losses, then [[MixtureOptimizer.Rounds]]
    * multiplicative-weights rounds upweight under-modeled domains.
    * The oracle replays the LM, the quantized per-doc losses, and
    * EVERY renormalization round — the weights hash-match only if the
    * whole trajectory is bit-identical.
    */
  def qMixOpt(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val scored = graft.text.UnigramLm.score(docs, "doc_id", "text")
    val perDoc = docs.select(col("doc_id"), col("source"))
      .join(scored, Seq("doc_id"))
      .select(col("source"),
        round(-col("avg_logp") * 1e6).cast(LongType).as("lm"))
    graft.ops.MixtureOptimizer.optimize(perDoc, "source", "lm")
  }

  lazy val qMixOptSql: String = {
    val sc = graft.text.UnigramLm.Scale
    val rounds = graft.ops.MixtureOptimizer.Rounds
    val sb = new StringBuilder
    sb ++=
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
         |v AS (SELECT tok, count(*) AS c FROM u GROUP BY tok),
         |tot AS (SELECT cast(sum(c) as bigint) AS tt FROM v),
         |q AS (SELECT tok,
         |        cast(round(ln(cast(c as double) / cast(tt as double)) * $sc) as bigint) AS lp
         |      FROM v CROSS JOIN tot),
         |p AS (SELECT u.doc_id, count(*) AS n_tokens, cast(sum(q.lp) as bigint) AS slp
         |      FROM u JOIN q USING (tok) GROUP BY u.doc_id),
         |pd AS (SELECT d.source,
         |    cast(round(-(round(CASE WHEN p.n_tokens > 0
         |      THEN cast(p.slp as double) / p.n_tokens / $sc.0
         |      ELSE 0.0 END, 6)) * 1000000) as bigint) AS lm
         |  FROM documents d LEFT JOIN p USING (doc_id)),
         |dom AS (SELECT source AS domain, count(*) AS n_docs,
         |    cast(sum(lm) as bigint) AS sl FROM pd GROUP BY 1),
         |d0 AS (SELECT domain, n_docs, sl,
         |    cast(round(cast(sl as double) / n_docs) as bigint) AS lmean
         |  FROM dom),
         |w0 AS (SELECT domain, n_docs, lmean,
         |    cast(round(1000000.0 / (count(*) OVER ())) as bigint) AS w
         |  FROM d0),
         |""".stripMargin
    for (r <- 1 to rounds) {
      sb ++=
        s"""w$r AS (SELECT domain, n_docs, lmean,
           |    cast(round(cast(w * lmean as double) /
           |      cast(sum(w * lmean) OVER () as double) * 1000000.0)
           |      as bigint) AS w
           |  FROM w${r - 1}),
           |""".stripMargin
    }
    sb ++=
      s"""fin AS (SELECT * FROM w$rounds)
         |SELECT domain, n_docs,
         |  round(cast(lmean as double) / 1000000, 6) AS mean_loss,
         |  round(cast(w as double) / 1000000, 6) AS weight
         |FROM fin""".stripMargin
    sb.toString
  }

  /** The measure → optimize → APPLY loop closed
    * ([[qMixOpt]] ∘ Sampling.domainMix): the optimizer's
    * multiplicative-weights mixture becomes the live sampling policy
    * — its weights collect to the driver (domain-count-sized model
    * state), feed domainMix's rate arithmetic, and the report
    * compares each surviving domain's REALIZED share against its
    * target. The oracle replays the LM, the full optimizer
    * trajectory, the rate derivation (min-scale + per-source
    * least(1, t·scale/n)), and the coordinate filter.
    */
  def qMixPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val scored = graft.text.UnigramLm.score(docs, "doc_id", "text")
    val perDoc = docs.select(col("doc_id"), col("source"))
      .join(scored, Seq("doc_id"))
      .select(col("source"),
        round(-col("avg_logp") * 1e6).cast(LongType).as("lm"))
    // bounded collect: one weight per domain (model state)
    val w = graft.ops.MixtureOptimizer.optimize(perDoc, "source", "lm")
      .select(col("domain"), col("weight"))
      .filter(col("weight") > 0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toSeq
      .sortBy(_._1)
    val kept = graft.ops.Sampling.domainMix(docs, "doc_id", "source", w)
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    val tgt = w.foldRight(lit(null).cast(DoubleType)) {
      case ((s0, t), acc) => when(col("source") === s0, lit(t)).otherwise(acc)
    }
    kept
      .withColumn("target_share", tgt)
      .withColumn("realized_share",
        round(col("n_kept").cast(DoubleType) /
          sum(col("n_kept")).over(
            org.apache.spark.sql.expressions.Window.partitionBy()), 6))
  }

  lazy val qMixPipelineSql: String = {
    val u = graft.ops.Sampling.coordinateSql("doc_id")
    s"""WITH wopt AS (
       |$qMixOptSql),
       |counts AS (SELECT source, count(*) AS n_src FROM documents
       |           GROUP BY 1),
       |tw AS (SELECT domain AS source, weight FROM wopt WHERE weight > 0),
       |j AS (SELECT c.source, c.n_src, t.weight
       |      FROM counts c JOIN tw t USING (source)),
       |sc AS (SELECT min(cast(n_src as double) / weight) AS scale FROM j),
       |kept AS (
       |  SELECT d.source FROM documents d
       |  JOIN j USING (source) CROSS JOIN sc
       |  WHERE $u < least(1.0, weight * scale / cast(n_src as double))),
       |k AS (SELECT source, count(*) AS n_kept FROM kept GROUP BY 1)
       |SELECT k.source, k.n_kept, j.weight AS target_share,
       |  round(cast(k.n_kept as double) / sum(k.n_kept) OVER (), 6)
       |    AS realized_share
       |FROM k JOIN j USING (source)""".stripMargin
  }

  /** DSIR importance weights: per-document log-ratio of a hashed
    * unigram+bigram LM trained on the TARGET slice (English docs) vs
    * the raw corpus — the data-selection score that says "looks like
    * the target domain". Quantized per-bucket log ratios make the
    * float-heavy weight hash-verifiable across engines.
    */
  def qDsir(s: SparkSession, d: String): DataFrame =
    graft.text.Dsir.importanceWeights(Tables.documents(s, d), "doc_id", "text",
      col("lang") === "en", numBuckets = 4096)

  val qDsirSql: String = {
    val sc = graft.text.Dsir.Scale
    val b = 4096
    s"""WITH t AS (SELECT doc_id, (lang = 'en') AS tgt, $toksSql AS toks
       |           FROM documents),
       |f AS (SELECT doc_id, tgt, unnest(list_concat(
       |        list_transform(toks, tk -> ${hash60Sql("tk")} % $b),
       |        list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
       |          i -> ${hash60Sql("toks[i] || ' ' || toks[i+1]")} % $b))) AS f
       |      FROM t),
       |v AS (SELECT f, count(*) AS cr,
       |        sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct
       |      FROM f GROUP BY f),
       |tot AS (SELECT cast(sum(cr) as bigint) AS tr,
       |               cast(sum(ct) as bigint) AS tt FROM v),
       |w AS (SELECT f,
       |        cast(round((ln((cast(ct as double) + 1.0) / (cast(tt as double) + $b.0)) -
       |                    ln((cast(cr as double) + 1.0) / (cast(tr as double) + $b.0))) * $sc)
       |          as bigint) AS lr
       |      FROM v CROSS JOIN tot),
       |p AS (SELECT f.doc_id, count(*) AS n_feats, cast(sum(w.lr) as bigint) AS slr
       |      FROM f JOIN w USING (f) GROUP BY f.doc_id)
       |SELECT d.doc_id,
       |  coalesce(p.n_feats, 0) AS n_feats,
       |  round(coalesce(cast(p.slr as double) / $sc.0, 0.0), 6) AS logw
       |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin
  }

  /** Self-trained bigram-LM scoring — the order-2 fluency signal:
    * per-document mean log p(w₂|w₁) under the corpus's own bigram
    * transition distribution (quantized per-bigram log-probs keep the
    * float-heavy score hash-verifiable, the UnigramLm discipline).
    */
  def qBigramLm(s: SparkSession, d: String): DataFrame =
    graft.text.BigramLm.score(Tables.documents(s, d), "doc_id", "text")

  val qBigramLmSql: String = {
    val sc = graft.text.BigramLm.Scale
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |u AS (SELECT doc_id,
       |        unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
       |          i -> toks[i] || ' ' || toks[i+1])) AS bg
       |      FROM t),
       |cb AS (SELECT bg, count(*) AS cb FROM u GROUP BY bg),
       |cl AS (SELECT split_part(bg, ' ', 1) AS w1, count(*) AS cl
       |       FROM u GROUP BY 1),
       |q AS (SELECT bg,
       |        cast(round(ln(cast(cb as double) / cast(cl as double)) * $sc) as bigint) AS lp
       |      FROM cb JOIN cl ON split_part(cb.bg, ' ', 1) = cl.w1),
       |p AS (SELECT u.doc_id, count(*) AS n_bigrams, cast(sum(q.lp) as bigint) AS slp
       |      FROM u JOIN q USING (bg) GROUP BY u.doc_id)
       |SELECT d.doc_id,
       |  coalesce(p.n_bigrams, 0) AS n_bigrams,
       |  round(CASE WHEN p.n_bigrams > 0
       |        THEN cast(p.slp as double) / p.n_bigrams / $sc.0
       |        ELSE 0.0 END, 6) AS avg_logp
       |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin
  }

  /** Quality-weighted deterministic sampling ("soft filtering"): each
    * document survives with probability equal to its quality score —
    * the smooth alternative to a hard threshold gate, hash-stable
    * row-for-row across engines and re-runs.
    */
  def qWeightedSample(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.weightedSample(
      Tables.documents(s, d).select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("weight")),
      "doc_id", "weight")

  val qWeightedSampleSql: String =
    s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
       |w AS (SELECT doc_id, source,
       |        ${qualityExprSql("toks", "text")} AS weight FROM t)
       |SELECT doc_id, source, weight FROM w
       |WHERE ${graft.ops.Sampling.coordinateSql("doc_id")} <
       |      least(1.0, greatest(0.0, weight))""".stripMargin

  /** Percentile-threshold curation gate: keep the top 25% of documents
    * by quality score, with the cutoff estimated by the bounded
    * histogram sketch (one hash-aggregate + broadcast scalar — no
    * exact-percentile sort at any scale).
    */
  def qQualityGate(s: SparkSession, d: String): DataFrame =
    graft.sketch.QuantileHist.topFraction(
      Tables.documents(s, d).select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("quality")),
      "quality", frac = 0.25, lo = 0.0, hi = 1.0, nBins = 256)

  val qQualityGateSql: String =
    s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
       |w AS (SELECT doc_id, source,
       |        ${qualityExprSql("toks", "text")} AS quality FROM t),
       |ctr AS (
       |  SELECT least(greatest(cast(floor((quality - 0.0) / (1.0 / 256)) as int),
       |           0), 255) AS qh_bin, count(*) AS cnt
       |  FROM w WHERE quality IS NOT NULL GROUP BY 1),
       |cum AS (
       |  SELECT qh_bin, cnt,
       |    sum(cnt) OVER (ORDER BY qh_bin) AS cum,
       |    sum(cnt) OVER () AS total
       |  FROM ctr),
       |cand AS (SELECT * FROM cum WHERE cum >= 0.75 * total),
       |pick AS (SELECT min(qh_bin) AS bin FROM cand),
       |thr AS (
       |  -- UNROUNDED, mirroring topFraction: display rounding could
       |  -- push the cutoff above values sitting exactly on it
       |  SELECT 0.0 + (1.0 / 256) *
       |    (c.qh_bin + (0.75 * c.total - (c.cum - c.cnt)) / c.cnt) AS est
       |  FROM cand c JOIN pick p ON c.qh_bin = p.bin)
       |SELECT w.doc_id, w.source, w.quality
       |FROM w CROSS JOIN thr WHERE w.quality >= thr.est""".stripMargin

  /** Per-SOURCE percentile gate: top 40% by quality WITHIN each source
    * domain — the per-domain quality budget (a global cutoff lets one
    * high-scoring domain crowd out every other). Grouped histogram
    * sketch + per-group threshold join, no per-group sort.
    */
  def qGroupGate(s: SparkSession, d: String): DataFrame =
    graft.sketch.QuantileHist.topFractionByGroup(
      Tables.documents(s, d).select(col("doc_id"), col("source"),
        TextAnalysis.qualityScore(col("text")).as("quality")),
      Seq("source"), "quality", frac = 0.4, lo = 0.0, hi = 1.0, nBins = 256)

  val qGroupGateSql: String =
    s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
       |w AS (SELECT doc_id, source,
       |        ${qualityExprSql("toks", "text")} AS quality FROM t),
       |ctr AS (
       |  SELECT source,
       |    least(greatest(cast(floor((quality - 0.0) / (1.0 / 256)) as int),
       |      0), 255) AS qh_bin, count(*) AS cnt
       |  FROM w WHERE quality IS NOT NULL GROUP BY 1, 2),
       |cum AS (
       |  SELECT source, qh_bin, cnt,
       |    sum(cnt) OVER (PARTITION BY source ORDER BY qh_bin) AS cum,
       |    sum(cnt) OVER (PARTITION BY source) AS total
       |  FROM ctr),
       |cand AS (SELECT * FROM cum WHERE cum >= 0.6 * total),
       |pick AS (SELECT source, min(qh_bin) AS bin FROM cand GROUP BY source),
       |thr AS (
       |  SELECT c.source, 0.0 + (1.0 / 256) *
       |    (c.qh_bin + (0.6 * c.total - (c.cum - c.cnt)) / c.cnt) AS est
       |  FROM cand c JOIN pick p ON c.source = p.source AND c.qh_bin = p.bin)
       |SELECT w.doc_id, w.source, w.quality
       |FROM w JOIN thr ON w.source = thr.source WHERE w.quality >= thr.est""".stripMargin

  /** Winnowing fingerprints (MOSS local-minima selection, k=3-gram
    * hashes, w=4 windows): the position-robust per-document signature
    * whose guarantee — any shared ≥(w+k-1)-token run contributes one
    * identical print to both documents — makes partial overlaps
    * joinable at signature cost.
    */
  def qWinnow(s: SparkSession, d: String): DataFrame = {
    val prints = graft.dedup.Winnow.winnowedPrints(col("text"), k = 3, w = 4)
    Tables.documents(s, d).select(
      col("doc_id"),
      greatest(TextAnalysis.tokenCount(col("text")) - 2, lit(0L)).as("n_grams"),
      size(prints).cast(LongType).as("n_prints"),
      array_join(transform(prints, x => x.cast(StringType)), ",").as("prints"))
  }

  val qWinnowSql: String = {
    val gram = hash60Sql("toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")
    val sel = "list_sort(list_distinct(list_transform(" +
      "range(1, len(grams) - 3 + 1), j -> list_min(grams[j:j+3]))))"
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |g AS (SELECT doc_id,
       |        list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
       |          i -> $gram) AS grams
       |      FROM t)
       |SELECT doc_id,
       |  len(grams) AS n_grams,
       |  cast(CASE WHEN len(grams) >= 4 THEN len($sel)
       |       WHEN len(grams) > 0 THEN 1 ELSE 0 END as bigint) AS n_prints,
       |  CASE WHEN len(grams) >= 4 THEN array_to_string($sel, ',')
       |       WHEN len(grams) > 0 THEN cast(list_min(grams) as varchar)
       |       ELSE '' END AS prints
       |FROM g""".stripMargin
  }

  /** Duplicated-span scrub (w=6 spans in ≥2 docs removed, text
    * reconstructed from surviving tokens) — the rewrite complement of
    * `q_span_dedup`'s analysis. The oracle replays tokenization, span
    * hashing, the document-frequency gate, position coverage, and the
    * ordered text rebuild exactly.
    */
  def qSpanScrub(s: SparkSession, d: String): DataFrame =
    Dedup.scrubDuplicateSpans(Tables.documents(s, d), "doc_id", "text",
      w = 6, minDocs = 2)

  val qSpanScrubSql: String = {
    val gram = hash60Sql((0 until 6).map(o => s"toks[i+$o]").mkString(" || ' ' || "))
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |g AS (SELECT doc_id,
       |        list_transform(range(1, greatest(len(toks) - 5, 0) + 1),
       |          i -> $gram % ${Dedup.P}) AS hs
       |      FROM t),
       |ps AS (SELECT doc_id, s.i AS pos, s.h AS h
       |       FROM (SELECT doc_id, unnest(list_transform(range(1, len(hs) + 1),
       |               i -> {'i': i, 'h': hs[i]})) AS s FROM g)),
       |f AS (SELECT h FROM (SELECT DISTINCT doc_id, h FROM ps)
       |      GROUP BY h HAVING count(*) >= 2),
       |cov AS (SELECT DISTINCT ps.doc_id, ps.pos + o.k AS p
       |        FROM ps JOIN f USING (h), unnest(range(0, 6)) AS o(k)),
       |tp AS (SELECT doc_id, s.p AS p, s.tok AS tok
       |       FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
       |               i -> {'p': i, 'tok': toks[i]})) AS s FROM t)),
       |kept AS (SELECT tp.doc_id, tp.p, tp.tok
       |         FROM tp LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.p = cov.p
       |         WHERE cov.p IS NULL),
       |k AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text_clean,
       |        count(*) AS n_kept FROM kept GROUP BY doc_id)
       |SELECT t.doc_id, coalesce(k.text_clean, '') AS text_clean,
       |  cast(coalesce(k.n_kept, 0) as bigint) AS n_kept,
       |  cast(len(t.toks) - coalesce(k.n_kept, 0) as bigint) AS n_dropped
       |FROM t LEFT JOIN k USING (doc_id)""".stripMargin
  }

  /** Exact duplicate-paragraph removal with reassembly
    * ([[graft.dedup.ParagraphDedup]]) — first occurrence of each
    * distinct cell wins corpus-wide, survivors re-joined in document
    * order. The synthetic corpus is single-line, so the query splits
    * at the literal " the " token as a stand-in structural boundary
    * (production uses "\n\n" — ParagraphDedupSpec exercises that on
    * multi-line fixtures); the oracle replays the split, the packed
    * (doc, position) ownership order, and the reassembly exactly.
    */
  def qParaDedup(s: SparkSession, d: String): DataFrame =
    graft.dedup.ParagraphDedup.dedupParagraphs(
      Tables.documents(s, d), "doc_id", "text", " the ")

  val qParaDedupSql: String = {
    val pack = s"doc_id * ${1L << graft.dedup.ParagraphDedup.IdxBits} + idx"
    s"""WITH base AS (SELECT doc_id, text FROM documents),
       |cells AS (
       |  SELECT doc_id, u.i - 1 AS idx, u.para
       |  FROM (SELECT doc_id,
       |          unnest(list_transform(range(1, len(ps) + 1),
       |            i -> {'i': i, 'para': ps[i]})) AS u
       |        FROM (SELECT doc_id, string_split(text, ' the ') AS ps
       |              FROM base))
       |  WHERE trim(u.para) != ''),
       |hashed AS (
       |  SELECT doc_id, idx, para, ${hash60Sql("para")} AS h, $pack AS pk
       |  FROM cells),
       |owners AS (SELECT h, min(pk) AS owner FROM hashed GROUP BY 1),
       |kept AS (SELECT hashed.* FROM hashed JOIN owners USING (h)
       |         WHERE pk = owner),
       |re AS (SELECT doc_id, string_agg(para, ' the ' ORDER BY idx)
       |         AS text_dedup, count(*) AS n_kept
       |       FROM kept GROUP BY 1),
       |tot AS (SELECT doc_id, count(*) AS n_paras FROM cells GROUP BY 1)
       |SELECT b.doc_id, coalesce(re.text_dedup, '') AS text_dedup,
       |  cast(coalesce(tot.n_paras, 0) as bigint) AS n_paras,
       |  cast(coalesce(re.n_kept, 0) as bigint) AS n_kept
       |FROM base b LEFT JOIN tot USING (doc_id) LEFT JOIN re USING (doc_id)"""
      .stripMargin
  }

  /** Exact-substring dedup ([[graft.dedup.SubstringDedup]]): every
    * duplicated run of ≥ 8 tokens keeps only its corpus-wide first
    * occurrence (packed (doc, position) minimum), later occurrences
    * scrubbed and the text rebuilt — sub-paragraph granularity, so a
    * passage straddling a paragraph boundary is caught where
    * `q_para_dedup` provably misses it. The oracle replays the
    * positional window table, the ownership minimum, position
    * coverage, and the rebuild exactly.
    */
  def qSubstrDedup(s: SparkSession, d: String): DataFrame =
    graft.dedup.SubstringDedup.dedupSubstrings(
      Tables.documents(s, d), "doc_id", "text", w = 8)

  private[queries] val SubstrW = 8

  /** Shared oracle CTE chain ending at `cov` (doc_id, p): the distinct
    * 0-based token positions covered by a non-owner duplicated window.
    */
  private[queries] val substrCovCtes: String = {
    val w = SubstrW
    val gram = hash60Sql((0 until w).map(o => s"toks[i+$o]").mkString(" || ' ' || "))
    val pack = s"doc_id * ${1L << graft.dedup.SubstringDedup.IdxBits} + (s.i - 1)"
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |g AS (SELECT doc_id,
       |        list_transform(range(1, greatest(len(toks) - ${w - 1}, 0) + 1),
       |          i -> $gram % ${Dedup.P}) AS hs
       |      FROM t),
       |ps AS (SELECT doc_id, s.i - 1 AS pos, s.h AS h, $pack AS pk
       |       FROM (SELECT doc_id, unnest(list_transform(range(1, len(hs) + 1),
       |               i -> {'i': i, 'h': hs[i]})) AS s FROM g)),
       |own AS (SELECT h, min(pk) AS owner FROM ps GROUP BY 1),
       |cov AS (SELECT DISTINCT ps.doc_id, ps.pos + o.k AS p
       |        FROM ps JOIN own USING (h), unnest(range(0, $w)) AS o(k)
       |        WHERE ps.pk != own.owner)""".stripMargin
  }

  val qSubstrDedupSql: String =
    s"""$substrCovCtes,
       |tp AS (SELECT doc_id, s.p - 1 AS p, s.tok AS tok
       |       FROM (SELECT doc_id, unnest(list_transform(range(1, len(toks) + 1),
       |               i -> {'p': i, 'tok': toks[i]})) AS s FROM t)),
       |kept AS (SELECT tp.doc_id, tp.p, tp.tok
       |         FROM tp LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.p = cov.p
       |         WHERE cov.p IS NULL),
       |k AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text_dedup,
       |        count(*) AS n_kept FROM kept GROUP BY doc_id)
       |SELECT t.doc_id, coalesce(k.text_dedup, '') AS text_dedup,
       |  cast(len(t.toks) as bigint) AS n_tokens,
       |  cast(coalesce(k.n_kept, 0) as bigint) AS n_kept,
       |  cast(len(t.toks) - coalesce(k.n_kept, 0) as bigint) AS n_dropped
       |FROM t LEFT JOIN k USING (doc_id)""".stripMargin

  /** The maximal duplicate extents behind `q_substr_dedup`: adjacent
    * covered positions merged by the islands rule into (span_start,
    * span_end) intervals per non-owner document. The oracle replays
    * the same per-document row_number island grouping.
    */
  def qSubstrSpans(s: SparkSession, d: String): DataFrame =
    graft.dedup.SubstringDedup.duplicateSpans(
      Tables.documents(s, d), "doc_id", "text", w = SubstrW)

  val qSubstrSpansSql: String =
    s"""$substrCovCtes,
       |r AS (SELECT doc_id, p,
       |        row_number() OVER (PARTITION BY doc_id ORDER BY p) AS rn
       |      FROM cov)
       |SELECT doc_id, cast(min(p) as bigint) AS span_start,
       |  cast(max(p) + 1 as bigint) AS span_end,
       |  cast(count(*) as bigint) AS span_len
       |FROM r GROUP BY doc_id, p - rn""".stripMargin

  /** Winnowed partial-overlap candidate pairs: documents sharing ≥2
    * selected prints (boilerplate prints df-capped at 100) with the
    * shared-print count.
    */
  def qWinnowPairs(s: SparkSession, d: String): DataFrame =
    graft.dedup.Winnow.overlapCandidates(Tables.documents(s, d),
      "doc_id", "text", k = 3, w = 4, minShared = 2, maxDocsPerPrint = 100)

  val qWinnowPairsSql: String = {
    val gram = hash60Sql("toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")
    val sel = "list_sort(list_distinct(list_transform(" +
      "range(1, len(grams) - 3 + 1), j -> list_min(grams[j:j+3]))))"
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |g AS (SELECT doc_id,
       |        list_transform(range(1, greatest(len(toks) - 2, 0) + 1),
       |          i -> $gram) AS grams
       |      FROM t),
       |pr AS (SELECT doc_id,
       |         unnest(CASE WHEN len(grams) >= 4 THEN $sel
       |                WHEN len(grams) > 0 THEN [list_min(grams)]
       |                ELSE [] END) AS p
       |       FROM g),
       |keep AS (SELECT p FROM pr GROUP BY p HAVING count(*) <= 100),
       |prc AS (SELECT pr.doc_id, pr.p FROM pr JOIN keep USING (p))
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
       |FROM prc a JOIN prc b ON a.p = b.p AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin
  }

  /** Per-document duplicated-span profile (6-token spans, shared by ≥2
    * docs) — the exact-substring-dedup signal over the corpus.
    */
  def qSpanDedup(s: SparkSession, d: String): DataFrame =
    Dedup.spanProfile(Tables.documents(s, d), "doc_id", "text",
      w = 6, minDocs = 2)

  val qSpanDedupSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |u AS (SELECT doc_id, unnest(${shinglesWSql("toks", 6)}) AS h FROM t),
       |f AS (SELECT h, count(*) AS nd FROM u GROUP BY h),
       |p AS (SELECT u.doc_id, count(*) AS n_spans,
       |        cast(sum(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) as bigint) AS n_dup
       |      FROM u JOIN f USING (h) GROUP BY u.doc_id)
       |SELECT d.doc_id,
       |  coalesce(p.n_spans, 0) AS n_spans,
       |  coalesce(p.n_dup, 0) AS n_dup,
       |  round(CASE WHEN p.n_spans > 0 THEN p.n_dup * 1.0 / p.n_spans
       |        ELSE 0.0 END, 6) AS dup_frac
       |FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id""".stripMargin

  /** Sequence packing: concat-and-chunk into 2,048-token packs,
    * shard-local by source (a global order would serialize; real
    * pipelines pack per shard). Every document maps to its token span
    * and overlapping pack range.
    */
  def qSeqPack(s: SparkSession, d: String): DataFrame =
    graft.ops.Packing.packSequences(
      Tables.documents(s, d).select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens")),
      "source", "doc_id", "n_tokens", budget = 2048)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("start_tok"), col("end_tok"), col("pack_first"), col("pack_last"))

  val qSeqPackSql: String =
    s"""WITH t AS (SELECT doc_id, source, len($toksSql) AS n_tokens
       |           FROM documents),
       |p AS (
       |  SELECT doc_id, source, n_tokens,
       |    cast(coalesce(sum(n_tokens) OVER (
       |      PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) as bigint)
       |      AS start_tok
       |  FROM t)
       |SELECT doc_id, source, n_tokens, start_tok,
       |  cast(start_tok + n_tokens as bigint) AS end_tok,
       |  cast(floor(start_tok / 2048) as bigint) AS pack_first,
       |  cast(floor(greatest(start_tok + n_tokens - 1, start_tok) / 2048) as bigint)
       |    AS pack_last
       |FROM p""".stripMargin

  /** Epoch-weighted replication: repeat scarce sources for fractional
    * epochs (src0 ×2.5, src3 ×3.25), pass src1 through once, and
    * downsample src2 to 0.6 — the upsampling mixture knob, one row per
    * emitted copy.
    */
  private[queries] val epochTargets = Seq(
    "src0" -> 2.5, "src1" -> 1.0, "src2" -> 0.6, "src3" -> 3.25)

  def qEpochMix(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.repeatFactor(
      Tables.documents(s, d).select(col("doc_id"), col("source")),
      "doc_id", "source", epochTargets)

  val qEpochMixSql: String = {
    val coord = graft.ops.Sampling.coordinateSql("doc_id")
    val epCase = epochTargets.map { case (s, v) =>
      s"WHEN '$s' THEN $v" }.mkString(" ")
    s"""WITH e AS (
       |  SELECT doc_id, source,
       |    CASE source $epCase ELSE 1.0 END AS ep
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source,
       |    cast(floor(ep) as int) +
       |      (CASE WHEN $coord < ep - floor(ep) THEN 1 ELSE 0 END) AS n
       |  FROM e)
       |SELECT doc_id, source, u.ci AS copy_idx
       |FROM c, unnest(range(0, n)) AS u(ci)""".stripMargin
  }

  /** Token-budget chunking with overlap — the dual of q_seq_pack:
    * 16-token windows, 4 tokens shared between consecutive chunks. A
    * narrow (shuffle-free) per-document explode.
    */
  def qChunkSplit(s: SparkSession, d: String): DataFrame =
    graft.ops.Chunking.chunkByTokens(
      Tables.documents(s, d), "doc_id", "text", chunkTokens = 16, overlap = 4)

  val qChunkSplitSql: String =
    graft.ops.Chunking.chunkOracleSql(
      "documents", "doc_id", "text", chunkTokens = 16, overlap = 4)

  /** Histogram-sketch percentiles of document length per source —
    * bounded-state (64 bins), mergeable, no sort; the scale path for
    * profiling quantiles over a 100 TB corpus.
    */
  def qQuantileHist(s: SparkSession, d: String): DataFrame =
    graft.sketch.QuantileHist.quantiles(
      Tables.documents(s, d), Seq("source"), "n_chars",
      lo = 0.0, hi = 600.0, nBins = 64, qs = Seq(0.5, 0.9, 0.99))

  val qQuantileHistSql: String =
    graft.sketch.QuantileHist.quantileOracleSql(
      "documents", "source", "n_chars",
      lo = 0.0, hi = 600.0, nBins = 64, qs = Seq(0.5, 0.9, 0.99))

  /** Per-source winsorization: document lengths clamped into their
    * source's [p05, p95] sketch-quantile band
    * ([[graft.sketch.QuantileHist.winsorize]]) — the outlier-robust
    * cleaning step ahead of any mean/variance feature. The oracle
    * replays the histogram quantiles and the clip exactly.
    */
  def qWinsorize(s: SparkSession, d: String): DataFrame =
    graft.sketch.QuantileHist.winsorize(
      Tables.documents(s, d).select(col("doc_id"), col("source"),
        col("n_chars")),
      Seq("source"), "n_chars", lo = 0.0, hi = 600.0, nBins = 64,
      pLo = 0.05, pHi = 0.95)

  val qWinsorizeSql: String = {
    val est = graft.sketch.QuantileHist.quantileOracleSql(
      "documents", "source", "n_chars", 0.0, 600.0, 64, Seq(0.05, 0.95))
    s"""WITH est AS (
       |$est),
       |b AS (SELECT source,
       |        max(CASE WHEN q = 0.05 THEN est END) AS lo_w,
       |        max(CASE WHEN q = 0.95 THEN est END) AS hi_w
       |      FROM est GROUP BY 1)
       |SELECT d.doc_id, d.source, d.n_chars,
       |  least(greatest(cast(d.n_chars as double), b.lo_w), b.hi_w)
       |    AS n_chars_w
       |FROM documents d JOIN b USING (source)""".stripMargin
  }

  /** Benchmark decontamination: corpus docs sharing ≥1 word 3-shingle
    * with the held-out benchmark slice (doc_id % 100 = 0), with the
    * distinct shared-shingle count — the eval-leakage report.
    */
  def qContam(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Dedup.contaminationReport(
      docs.filter(col("doc_id") % 100 =!= 0),
      docs.filter(col("doc_id") % 100 === 0),
      "doc_id", "text", w = 3)
  }

  val qContamSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |g AS (SELECT doc_id, ${shinglesWSql("toks", 3)} AS gs FROM t),
       |bh AS (SELECT DISTINCT u.h FROM g, unnest(g.gs) AS u(h)
       |       WHERE doc_id % 100 = 0),
       |ch AS (SELECT doc_id, u.h FROM g, unnest(g.gs) AS u(h)
       |       WHERE doc_id % 100 <> 0)
       |SELECT doc_id, count(*) AS n_shared
       |FROM ch JOIN bh USING (h) GROUP BY 1""".stripMargin

  /** Domain mixing: downsample sources to a target mixture (src0-src3
    * at 40/30/20/10) — per-source kept counts after the deterministic
    * rate filter.
    */
  private[queries] val mixTargets = Seq(
    "src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)

  def qDomainMix(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.domainMix(
      Tables.documents(s, d), "doc_id", "source", mixTargets)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"))

  val qDomainMixSql: String = {
    val inSet = inList(mixTargets.map(_._1))
    val tgt = mixTargets.foldRight("cast(NULL as double)") {
      case ((s0, t), acc) => s"CASE WHEN source = '$s0' THEN $t ELSE $acc END"
    }
    val u = graft.ops.Sampling.coordinateSql("doc_id")
    s"""WITH counts AS (
       |  SELECT source, count(*) AS n_src FROM documents
       |  WHERE source IN $inSet GROUP BY 1),
       |sc AS (SELECT min(cast(n_src as double) / ($tgt)) AS scale FROM counts),
       |kept AS (
       |  SELECT d.source FROM documents d
       |  JOIN counts USING (source) CROSS JOIN sc
       |  WHERE $u < least(1.0, ($tgt) * scale / cast(n_src as double)))
       |SELECT source, count(*) AS n_kept FROM kept GROUP BY 1""".stripMargin
  }

  /** Temperature-flattened mixture (α = 0.5, shares ∝ √n per source):
    * per-source kept counts after the flattening. The oracle derives
    * the √-targets in-plan (IEEE-exact sqrt) and replays the shared
    * domainMix rate arithmetic.
    */
  def qTempMix(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.temperatureMix(
      Tables.documents(s, d), "doc_id", "source", mixTargets.map(_._1))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"))

  val qTempMixSql: String = {
    val inSet = inList(mixTargets.map(_._1))
    val u = graft.ops.Sampling.coordinateSql("doc_id")
    s"""WITH counts AS (
       |  SELECT source, count(*) AS n_src FROM documents
       |  WHERE source IN $inSet GROUP BY 1),
       |sc AS (SELECT min(cast(n_src as double) /
       |         sqrt(cast(n_src as double))) AS scale FROM counts),
       |kept AS (
       |  SELECT d.source FROM documents d
       |  JOIN counts USING (source) CROSS JOIN sc
       |  WHERE $u < least(1.0,
       |    sqrt(cast(n_src as double)) * scale / cast(n_src as double)))
       |SELECT source, count(*) AS n_kept FROM kept GROUP BY 1""".stripMargin
  }

  /** Per-source corpus profile — the curation dashboard aggregation:
    * doc/token volume, mean quality and repetition (exact DECIMAL sums
    * of the 6-dp-rounded scores, divided once at the end — no
    * order-dependent double accumulation), and PII incidence.
    */
  def qCorpusProfile(s: SparkSession, d: String): DataFrame = {
    import graft.text.{TextAnalysis => TA}
    Tables.documents(s, d)
      .select(col("source"),
        TA.tokenCount(col("text")).as("toks"),
        TA.qualityScore(col("text")).cast(DecimalType(10, 6)).as("q"),
        TA.repetitionRatio(col("text")).cast(DecimalType(10, 6)).as("rr"),
        (TA.piiCount(col("text")) > 0).cast(IntegerType).as("has_pii"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).cast(LongType).as("n_tokens"),
        (sum(col("q")).cast(DoubleType) / count(lit(1))).as("mean_quality"),
        (sum(col("rr")).cast(DoubleType) / count(lit(1))).as("mean_repetition"),
        sum(col("has_pii")).cast(LongType).as("n_pii_docs"))
  }

  val qCorpusProfileSql: String = {
    def q(pat: String) = pat.replace("'", "''")
    val piiHits = TextAnalysis.piiPatterns.map { case (pat, _) =>
      s"len(regexp_extract_all(text, '${q(pat)}'))"
    }.mkString(" + ")
    s"""WITH t AS (SELECT source, text, $toksSql AS toks FROM documents),
       |f AS (
       |  SELECT source, len(toks) AS n_toks,
       |    cast(${qualityExprSql("toks", "text")} as decimal(10,6)) AS q,
       |    cast(round(CASE WHEN greatest(len(toks) - 2, 0) > 0
       |      THEN 1.0 - len(${shinglesSql("toks")}) * 1.0 / greatest(len(toks) - 2, 0)
       |      ELSE 0.0 END, 6) as decimal(10,6)) AS rr,
       |    CASE WHEN $piiHits > 0 THEN 1 ELSE 0 END AS has_pii
       |  FROM t)
       |SELECT source, count(*) AS n_docs,
       |  cast(sum(n_toks) as bigint) AS n_tokens,
       |  cast(sum(q) as double) / count(*) AS mean_quality,
       |  cast(sum(rr) as double) / count(*) AS mean_repetition,
       |  cast(sum(has_pii) as bigint) AS n_pii_docs
       |FROM f GROUP BY 1""".stripMargin
  }

  /** The blocklist dictionary for `q_blocklist` — substring terms over
    * the lowercased document text, including multi-word phrases, a
    * term nested inside another's suffix ("scan" in "table scan" — the
    * automaton's dict-suffix output path), an interior substring of a
    * vocabulary word ("art" inside "part"), and never-occurring terms
    * ("password", "drop table" — the realistic blocklist case where
    * most terms hit nothing).
    *
    * Every term is BORDER-FREE (no proper prefix that is also a
    * suffix), asserted below: that is what makes the automaton's
    * every-end-position count equal the oracle's non-overlapping
    * `replace`-based count (see [[graft.functions.AhoCorasick.hasBorder]]).
    * The kernel itself has no such restriction.
    */
  val blockTerms: Seq[String] = {
    val ts = Seq(
      "slow query", "table scan", "big data", "key order", "drop table",
      "slow", "scan", "merge", "dup", "art", "row", "password")
    require(ts.forall(t => !graft.functions.AhoCorasick.hasBorder(t)),
      "blocklist terms must be border-free for the oracle identity")
    ts
  }

  /** Dictionary blocklist screening (the C4/RefinedWeb banned-word
    * gate) — per-source report of how much of the corpus a blocklist
    * touches. ONE Aho–Corasick pass per document matches the whole
    * dictionary (`functions.Blocklist`, a native codegen'd kernel
    * whose automaton rides the generated code as a reference object),
    * vs the naive k-`contains` scans — at 100 TB and a 10⁴-10⁶ term
    * blocklist this is the difference between one streaming pass and
    * k of them. Plan shape: narrow codegen'd map → one partially
    * aggregated hash shuffle on `source`; nothing else.
    */
  def qBlocklist(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"),
        graft.functions.Blocklist
          .blocklist_hits(lower(col("text")), blockTerms).as("h"))
      .select(col("source"), col("h.hits").as("hits"),
        col("h.terms").as("terms"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("flagged_docs"),
        sum(col("hits").cast(LongType)).as("total_hits"),
        sum(col("terms").cast(LongType)).as("distinct_term_hits"),
        max(col("hits")).as("max_hits"))

  /** Non-overlapping replace-count per term (== the automaton's count
    * for border-free terms); documents are ASCII so char and byte
    * lengths agree on both engines.
    */
  val qBlocklistSql: String = {
    def esc(t: String) = t.replace("'", "''")
    val hits = blockTerms.map(t =>
      s"(len(tl) - len(replace(tl, '${esc(t)}', ''))) // ${t.length}")
      .mkString("\n    + ")
    val terms = blockTerms.map(t =>
      s"CASE WHEN contains(tl, '${esc(t)}') THEN 1 ELSE 0 END")
      .mkString("\n    + ")
    s"""WITH t AS (SELECT source, lower(text) AS tl FROM documents),
       |h AS (SELECT source,
       |  $hits AS hits,
       |  $terms AS terms
       |FROM t)
       |SELECT source, count(*) AS docs,
       |  cast(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) as bigint) AS flagged_docs,
       |  cast(sum(hits) as bigint) AS total_hits,
       |  cast(sum(terms) as bigint) AS distinct_term_hits,
       |  cast(max(hits) as int) AS max_hits
       |FROM h GROUP BY source""".stripMargin
  }

  /** Blocklist APPLIED as a curation gate (q_blocklist is the report;
    * this is the drop): keep only zero-hit documents, account for the
    * token cost per source. Same one-pass automaton — the gate adds a
    * codegen'd filter on the struct field, no second text scan, and
    * the whole thing stays scan → map → filter → one agg shuffle.
    */
  def qBlocklistGate(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"),
        TextAnalysis.tokenCount(col("text")).as("n_toks"),
        graft.functions.Blocklist
          .blocklist_hits(lower(col("text")), blockTerms)
          .getField("hits").as("hits"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("docs_in"),
        sum(when(col("hits") === 0, 1L).otherwise(0L)).as("docs_kept"),
        sum(col("n_toks")).as("toks_in"),
        sum(when(col("hits") === 0, col("n_toks")).otherwise(0L))
          .as("toks_kept"))
      .withColumn("pct_kept",
        round(col("docs_kept").cast("double") /
          col("docs_in").cast("double"), 6))

  val qBlocklistGateSql: String = {
    def esc(t: String) = t.replace("'", "''")
    val hits = blockTerms.map(t =>
      s"(len(tl) - len(replace(tl, '${esc(t)}', ''))) // ${t.length}")
      .mkString("\n    + ")
    s"""WITH t AS (SELECT source, lower(text) AS tl,
       |            cast(len($toksSql) as bigint) AS n_toks
       |           FROM documents),
       |h AS (SELECT source, n_toks, $hits AS hits FROM t)
       |SELECT source, count(*) AS docs_in,
       |  cast(sum(CASE WHEN hits = 0 THEN 1 ELSE 0 END) as bigint) AS docs_kept,
       |  cast(sum(n_toks) as bigint) AS toks_in,
       |  cast(sum(CASE WHEN hits = 0 THEN n_toks ELSE 0 END) as bigint) AS toks_kept,
       |  round(cast(sum(CASE WHEN hits = 0 THEN 1 ELSE 0 END) as double) /
       |    count(*), 6) AS pct_kept
       |FROM h GROUP BY source""".stripMargin
  }

  /** Per-TERM blocklist attribution — which dictionary terms fire
    * (doc reach + occurrence mass) and which are dead weight, the
    * report that keeps a production blocklist curated. The kernel's
    * attribution variant emits only the MATCHED terms per document
    * (per-row work scales with matches, never with dictionary size —
    * thread-local scratch, O(matched) reset), then one explode + one
    * agg shuffle keyed by term id; zero-hit terms re-enter via a
    * broadcast right-join against the literal dictionary frame.
    */
  def qBlocklistTerms(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val agg = Tables.documents(s, d)
      .select(explode(graft.functions.Blocklist
        .blocklist_term_counts(lower(col("text")), blockTerms)).as("t"))
      .select(col("t.term").as("term_id"), col("t.cnt").as("cnt"))
      .groupBy(col("term_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("cnt").cast(LongType)).as("n_hits"))
    blockTerms.zipWithIndex.map { case (t, i) => (i, t) }
      .toDF("term_id", "term")
      .join(agg, Seq("term_id"), "left")
      .select(col("term_id"), col("term"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  val qBlocklistTermsSql: String = {
    def esc(t: String) = t.replace("'", "''")
    val branches = blockTerms.zipWithIndex.map { case (t, i) =>
      s"""SELECT $i AS term_id, '${esc(t)}' AS term,
         |  (len(tl) - len(replace(tl, '${esc(t)}', ''))) // ${t.length} AS cnt
         |FROM t""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH t AS (SELECT lower(text) AS tl FROM documents),
       |u AS (
       |  $branches)
       |SELECT term_id, term,
       |  cast(sum(CASE WHEN cnt > 0 THEN 1 ELSE 0 END) as bigint) AS n_docs,
       |  cast(sum(cnt) as bigint) AS n_hits
       |FROM u GROUP BY term_id, term""".stripMargin
  }
}
