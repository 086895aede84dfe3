package graft.queries

import graft.Tables
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.Ann
import graft.text.{Bm25, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data-pipeline operators (dedup / similarity / text analysis
  * / multimodal) as driver-checkable queries. DuckDB oracle SQL is
  * GENERATED from the same constants the Spark operators use (hash
  * coefficients, stopword lists, marker sets) so there is a single
  * source of truth for the algorithm parameters.
  */
object PipelineQueries {

  // --- shared DuckDB SQL fragments, kept in lockstep with TextAnalysis/Dedup

  /** DuckDB: whitespace tokens of text (empty-token-free). */
  private val toksSql =
    """list_filter(string_split_regex(trim(text), '\s+'), x -> x != '')"""

  /** DuckDB: graft.text.TextAnalysis.hash60 of expression e. */
  private def hash60Sql(e: String): String =
    s"cast(('0x' || substr(md5($e), 1, 15)) as bigint)"

  /** DuckDB: distinct hashed word w-shingles of the token list `l`. */
  private def shinglesWSql(l: String, w: Int): String = {
    val joined = (0 until w).map(o => s"$l[i+$o]").mkString(" || ' ' || ")
    s"""list_distinct(list_transform(
       |  list_transform(range(1, greatest(len($l) - ${w - 1}, 0) + 1),
       |    i -> $joined),
       |  g -> ${hash60Sql("g")} % ${Dedup.P}))""".stripMargin
  }

  /** DuckDB: distinct hashed word 3-shingles of the token list `l`. */
  private def shinglesSql(l: String): String = shinglesWSql(l, 3)

  /** DuckDB: 16-element minhash signature of shingle-hash list `sh`. */
  private def minhashSql(sh: String): String =
    Dedup.minhashCoeffs.map { case (a, b) =>
      s"coalesce(list_min(list_transform($sh, x -> (x * $a + $b) % ${Dedup.P})), ${Dedup.P})"
    }.mkString("[", ",\n ", "]")

  private def inList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("(", ",", ")")

  /** DuckDB: left-fold dot product of two list columns — the oracle
    * image of Ann.dot (graft.functions.DotFold): same operand order,
    * same double math.
    */
  private def listDotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(cast(0 as double),
       |  list_transform(range(1, len($a) + 1),
       |    i -> cast($a[i] as double) * cast($b[i] as double))),
       |  (acc, v) -> acc + v)""".stripMargin

  /** DuckDB: sign-pattern LSH bucket key of `vec` over the first
    * `h` dim-64 hyperplanes — the oracle image of Ann.lshKey
    * (single-sourced plane constants via Ann.hyperplane).
    */
  private def lshKeySql(vec: String, h: Int, offset: Int = 0): String = {
    def dotPlane(p: Seq[Double]) =
      s"""list_reduce(list_prepend(cast(0 as double),
         |  list_transform(range(1, 65),
         |    i -> cast($vec[i] as double) * (${p.mkString("[", ",", "]")})[i])),
         |  (acc, x) -> acc + x)""".stripMargin
    (0 until h).map(i => Ann.hyperplane(offset + i, 64))
      .map(p => s"(CASE WHEN ${dotPlane(p)} >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")
  }

  /** DuckDB: one SELECT per LSH band, exploding table `src`'s
    * (id, sig) rows into ($idOut, sig, bucket) — the single source of
    * the band/row layout for every MinHash oracle.
    */
  private def bandSelectsSql(src: String, idOut: String): String =
    (0 until Dedup.bands).map { b =>
      val key = (1 to Dedup.rowsPerBand)
        .map(r => s"sig[${b * Dedup.rowsPerBand + r}]")
        .mkString(s"'${b}' || '_' || ", " || '_' || ", "")
      s"SELECT $idOut, sig, $key AS bucket FROM $src"
    }.mkString("\nUNION ALL\n")

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
  private def urlHostExpr: org.apache.spark.sql.Column = {
    val h = TextAnalysis.hash60(col("doc_id").cast(StringType)) % 5
    when(h === 0, concat(col("source"), lit(".com")))
      .when(h === 1, concat(lit("www."), col("source"), lit(".co.uk")))
      .when(h === 2, concat(lit("blog"), pmod(col("doc_id"), lit(7)),
        lit("."), col("source"), lit(".github.io")))
      .when(h === 3, concat(col("source"), lit(".org.uk")))
      .otherwise(concat(lit("cdn."), col("source"), lit(".net")))
  }

  /** DuckDB twin of [[urlHostExpr]] (a CASE over the same hash). */
  private lazy val urlHostCaseSql: String = {
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
  private val DecontamN = 5

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
  private val SeqLen = 128

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

  private val normSql = """trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"""
  val qFingerprintSql: String =
    s"""SELECT doc_id,
       |  md5($normSql) AS fp_hex,
       |  ${hash60Sql(normSql)} AS fp60
       |FROM documents""".stripMargin

  /** DuckDB: the composite quality score of (toks, text) expressions —
    * the single-expression form of qTextQualitySql's staged version
    * (same arithmetic, same rounding).
    */
  private def qualityExprSql(toks: String, text: String): String = {
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
  private def predictedLangSql(toks: String): String = {
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

  private val SubstrW = 8

  /** Shared oracle CTE chain ending at `cov` (doc_id, p): the distinct
    * 0-based token positions covered by a non-owner duplicated window.
    */
  private val substrCovCtes: String = {
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
  private val epochTargets = Seq(
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
  private val mixTargets = Seq(
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

  // --------------------------------------------------------------- dedup

  /** Exact dedup by content fingerprint. */
  def qDedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(Tables.documents(s, d), "doc_id", "text")

  val qDedupExactSql: String =
    s"""SELECT md5($normSql) AS fp,
       |  min(doc_id) AS keep_id, count(*) AS n_copies
       |FROM documents GROUP BY 1""".stripMargin

  /** MinHash signatures (the hard part of MinHash-LSH, verified
    * element-by-element against the oracle).
    */
  def qMinhashSig(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), Dedup.shingleHashes(col("text")).as("grams"))
      .select(col("doc_id"),
        array_join(Dedup.minhashSignature(col("grams")), ",").as("sig"))

  val qMinhashSigSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id, ${shinglesSql("toks")} AS grams FROM t)
       |SELECT doc_id, array_to_string(${minhashSql("grams")}, ',') AS sig
       |FROM sh""".stripMargin

  /** MinHash LSH candidate pairs (band-bucket join + signature
    * agreement).
    */
  def qMinhashPairs(s: SparkSession, d: String): DataFrame =
    Dedup.minhashCandidates(Tables.documents(s, d), "doc_id", "text")

  val qMinhashPairsSql: String = {
    val bandSelects = bandSelectsSql("sigs", "doc_id")
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (SELECT doc_id, ${shinglesSql("toks")} AS grams FROM t),
       |sigs AS (SELECT doc_id, ${minhashSql("grams")} AS sig FROM sh),
       |buckets AS ($bandSelects)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  len(list_filter(range(1, ${Dedup.minhashCoeffs.size} + 1),
       |      i -> a.sig[i] = b.sig[i])) * 1.0 / ${Dedup.minhashCoeffs.size}
       |    AS sig_agreement
       |FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id""".stripMargin
  }

  /** End-to-end near-dedup application: the corpus minus confidently
    * near-duplicate docs (higher id of each candidate pair dropped).
    */
  def qDedupApply(s: SparkSession, d: String): DataFrame =
    Dedup.dropNearDuplicates(Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"), col("source"))

  val qDedupApplySql: String = {
    val bandSelects = bandSelectsSql("sigs", "doc_id")
    // exact-dedup-first mirror of Dedup.dropNearDuplicates: collapse to
    // one min-id representative per normalized fingerprint, then run
    // MinHash-LSH over representatives only
    s"""WITH reps AS (
       |  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5($normSql)),
       |t AS (SELECT doc_id, $toksSql AS toks FROM documents
       |      WHERE doc_id IN (SELECT doc_id FROM reps)),
       |sh AS (SELECT doc_id, ${shinglesSql("toks")} AS grams FROM t),
       |sigs AS (SELECT doc_id, ${minhashSql("grams")} AS sig FROM sh),
       |buckets AS ($bandSelects),
       |drops AS (
       |  SELECT DISTINCT b.doc_id
       |  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
       |  WHERE len(list_filter(range(1, ${Dedup.minhashCoeffs.size} + 1),
       |        i -> a.sig[i] = b.sig[i])) * 1.0 / ${Dedup.minhashCoeffs.size} >= 0.75)
       |SELECT doc_id, source FROM documents
       |WHERE doc_id IN (SELECT doc_id FROM reps)
       |  AND doc_id NOT IN (SELECT doc_id FROM drops)""".stripMargin
  }

  /** Duplicate clustering: every document labeled with the min doc id
    * of its transitive near-duplicate component (exact-first reps →
    * LSH edges → connected components → docs inherit their rep's
    * component; singletons label themselves).
    */
  def qDupClusters(s: SparkSession, d: String): DataFrame =
    Dedup.duplicateClusters(Tables.documents(s, d), "doc_id", "text")

  val qDupClustersSql: String = {
    val bandSelects = bandSelectsSql("sigs", "doc_id")
    // transitive closure over the (tiny) near-dup edge list via a
    // recursive UNION — set semantics dedups across iterations, so the
    // recursion terminates on the cyclic symmetrized graph. All values
    // are BIGINT doc ids (engine-version-proof).
    s"""WITH RECURSIVE reps AS (
       |  SELECT md5($normSql) AS fp, min(doc_id) AS doc_id
       |  FROM documents GROUP BY 1),
       |t AS (SELECT doc_id, $toksSql AS toks FROM documents
       |      WHERE doc_id IN (SELECT doc_id FROM reps)),
       |sh AS (SELECT doc_id, ${shinglesSql("toks")} AS grams FROM t),
       |sigs AS (SELECT doc_id, ${minhashSql("grams")} AS sig FROM sh),
       |buckets AS ($bandSelects),
       |edges AS (
       |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
       |  FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
       |  WHERE len(list_filter(range(1, ${Dedup.minhashCoeffs.size} + 1),
       |        i -> a.sig[i] = b.sig[i])) * 1.0 / ${Dedup.minhashCoeffs.size} >= 0.75),
       |sym AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM sym
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON s.src = r.dst),
       |comp AS (
       |  SELECT src AS id, least(src, min(dst)) AS component
       |  FROM reach GROUP BY src),
       |m AS (
       |  SELECT d.doc_id, r.doc_id AS rep
       |  FROM documents d JOIN reps r ON md5($normSql) = r.fp)
       |SELECT m.doc_id, coalesce(c.component, m.rep) AS cluster_id
       |FROM m LEFT JOIN comp c ON c.id = m.rep""".stripMargin
  }

  /** Quality-aware dedup representative: within each near-duplicate
    * cluster keep the HIGHEST-quality copy (ties to the lower id) —
    * the curation-grade refinement of `q_dedup_apply`'s keep-lowest-id
    * rule, which discards good rewrites in favor of whatever copy
    * happened to be ingested first. Composes
    * [[graft.dedup.Dedup.duplicateClusters]] with
    * [[graft.text.TextAnalysis.qualityScore]]; one extra window rank
    * over the cluster frame (tiny: one row per document, keyed by
    * cluster), nothing quadratic.
    */
  def qDedupBest(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val clusters = Dedup.duplicateClusters(docs, "doc_id", "text")
    val scored = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    clusters.join(scored, Seq("doc_id"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("cluster_id"), col("doc_id"), col("quality"))
  }

  val qDedupBestSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks, text FROM documents),
       |w AS (SELECT doc_id, ${qualityExprSql("toks", "text")} AS quality FROM t),
       |j AS (SELECT c.cluster_id, c.doc_id, w.quality,
       |        row_number() OVER (PARTITION BY c.cluster_id
       |          ORDER BY w.quality DESC, c.doc_id ASC) AS rk
       |      FROM ($qDupClustersSql) c JOIN w USING (doc_id))
       |SELECT cluster_id, doc_id, quality FROM j WHERE rk = 1""".stripMargin

  /** Survivorship / golden-record fusion over the near-duplicate
    * clusters: one fused record per cluster — longest text elects the
    * canonical id, categorical fields (lang, source) fuse by
    * most-frequent-wins with smallest-value ties, n_chars sums
    * (graft.ops.Survivorship). The MDM merge step that follows
    * clustering: `q_dedup_best` elects a member ROW, this fuses
    * FIELDS across members. All-aggregation plan (struct-max +
    * count/max/min chains), no windows — a hot cluster partial-
    * aggregates instead of pinning one sort task.
    */
  def qSurvivor(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val clusters = Dedup.duplicateClusters(docs, "doc_id", "text")
    graft.ops.Survivorship.goldenRecords(
      docs.join(clusters, Seq("doc_id")),
      clusterCol = "cluster_id", idCol = "doc_id", textCol = "text",
      modalCols = Seq("lang", "source"), sumCols = Seq("n_chars"))
  }

  val qSurvivorSql: String = {
    def modal(cte: String, field: String) =
      s"""${cte}c AS (
         |  SELECT cluster_id, $field AS v, count(*) AS c FROM j
         |  WHERE $field IS NOT NULL GROUP BY 1, 2),
         |$cte AS (
         |  SELECT cluster_id, v FROM (
         |    SELECT cluster_id, v, row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY c DESC, v ASC) AS rn
         |    FROM ${cte}c) WHERE rn = 1)""".stripMargin
    s"""WITH j AS (
       |  SELECT c.cluster_id, d.doc_id, d.text, d.lang, d.source, d.n_chars
       |  FROM ($qDupClustersSql) c JOIN documents d ON c.doc_id = d.doc_id),
       |core AS (
       |  SELECT cluster_id, count(*) AS n_members,
       |    cast(sum(n_chars) as bigint) AS sum_n_chars
       |  FROM j GROUP BY 1),
       |canon AS (
       |  SELECT cluster_id, doc_id AS canonical_id,
       |    length(text) AS canonical_len,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY length(text) DESC, doc_id ASC) AS rn
       |  FROM j),
       |${modal("ml", "lang")},
       |${modal("ms", "source")}
       |SELECT core.cluster_id, core.n_members, cn.canonical_id,
       |  cn.canonical_len, core.sum_n_chars,
       |  ml.v AS modal_lang, ms.v AS modal_source
       |FROM core
       |JOIN (SELECT cluster_id, canonical_id, canonical_len
       |      FROM canon WHERE rn = 1) cn ON core.cluster_id = cn.cluster_id
       |LEFT JOIN ml ON core.cluster_id = ml.cluster_id
       |LEFT JOIN ms ON core.cluster_id = ms.cluster_id""".stripMargin
  }

  /** Quality-per-token Pareto frontier (graft.ops.Skyline.front2d):
    * documents no budget-constrained selection policy would skip —
    * maximize quality score, minimize token count, keep the
    * non-dominated set. The engine runs the level-sweep formulation
    * (per-level min + one window over DISTINCT quality levels + a
    * joined-back threshold — O(N) + a tiny sort); the oracle is the
    * quadratic NOT EXISTS textbook definition, so the algebraic
    * equivalence is what the hash match certifies.
    */
  def qPareto(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val scored = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    graft.ops.Skyline.front2d(scored, "quality", "n_tokens")
  }

  val qParetoSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks, text FROM documents),
       |w AS (SELECT doc_id, ${qualityExprSql("toks", "text")} AS quality,
       |        len(toks) AS n_tokens FROM t)
       |SELECT p.doc_id, p.quality, p.n_tokens FROM w p
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM w o
       |  WHERE o.quality >= p.quality AND o.n_tokens <= p.n_tokens
       |    AND (o.quality > p.quality OR o.n_tokens < p.n_tokens))""".stripMargin

  /** Join-cardinality estimation by CMS inner product
    * (graft.sketch.CountMin.joinSizeEstimate): |lineitem ⋈ σ(part)| on
    * partkey, estimated from two d×65536 counter tables (w sized so the collision term ‖fA‖₁‖fB‖₁/w sits well under the true size) built in one
    * narrow pass per side — the planner statistic that decides
    * broadcast-vs-shuffle (or predicts a skew blowup) BEFORE paying
    * the join. Emits per-depth estimates, the sketch min, and the
    * exact size so the one-sided error is visible in the result.
    */
  def qJoinCard(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val p = Tables.part(s, d).filter(col("p_retailprice") > 975.0)
    val est = graft.sketch.CountMin.joinSizeEstimate(
      l, "l_partkey", p, "p_partkey", w = 65536)
    val exact = l.join(p, col("l_partkey") === col("p_partkey"))
      .agg(count(lit(1)).as("exact_n"))
    est.crossJoin(broadcast(exact))
  }

  val qJoinCardSql: String =
    s"""WITH ka AS (SELECT l_partkey AS k FROM lineitem),
       |kb AS (SELECT p_partkey AS k FROM part WHERE p_retailprice > 975.0),
       |${graft.sketch.CountMin.joinSizeCtesSql(65536)},
       |ex AS (
       |  SELECT count(*) AS exact_n FROM lineitem
       |  JOIN part ON l_partkey = p_partkey
       |  WHERE p_retailprice > 975.0)
       |SELECT r.cm_row, r.row_est,
       |  (SELECT min(row_est) FROM rows_) AS est, ex.exact_n
       |FROM rows_ r CROSS JOIN ex""".stripMargin

  /** k-anonymity / l-diversity release audit with a local-recoding
    * generalization ladder (graft.ops.Privacy): quasi-identifiers
    * (nation, market segment, account-balance band), entity =
    * customer, sensitive = order priority. Classes with < 5 distinct
    * customers or < 2 distinct priorities coarsen their band 1000 →
    * 5000 → suppressed; residual failures flag `risky`. The privacy
    * gate a data-release pipeline runs before publishing per-group
    * aggregates.
    */
  def qKanon(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val base = c.join(o, col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("bigint").as("qi_nation"),
        col("c_mktsegment").as("qi_seg"),
        (floor(col("c_acctbal") / 1000) * 1000).cast("bigint").as("band_fine"),
        (floor(col("c_acctbal") / 5000) * 5000).cast("bigint").as("band_coarse"),
        col("c_custkey"), col("o_orderpriority"))
    graft.ops.Privacy.generalize(base, Seq("qi_nation", "qi_seg"),
      "band_fine", "band_coarse", "c_custkey", "o_orderpriority",
      k = 5, l = 2)
  }

  val qKanonSql: String = {
    val (kk, ll) = (5, 2)
    s"""WITH base AS (
       |  SELECT cast(c_nationkey as bigint) AS qi_nation,
       |    c_mktsegment AS qi_seg,
       |    cast(floor(c_acctbal / 1000) * 1000 as bigint) AS band_fine,
       |    cast(floor(c_acctbal / 5000) * 5000 as bigint) AS band_coarse,
       |    c_custkey, o_orderpriority
       |  FROM customer JOIN orders ON o_custkey = c_custkey),
       |g0 AS (
       |  SELECT qi_nation, qi_seg, band_fine,
       |    count(DISTINCT c_custkey) AS k_size,
       |    count(DISTINCT o_orderpriority) AS l_div
       |  FROM base GROUP BY 1, 2, 3),
       |rows1 AS (
       |  SELECT b.* FROM base b
       |  JOIN g0 ON b.qi_nation = g0.qi_nation AND b.qi_seg = g0.qi_seg
       |    AND b.band_fine = g0.band_fine
       |  WHERE g0.k_size < $kk OR g0.l_div < $ll),
       |g1 AS (
       |  SELECT qi_nation, qi_seg, band_coarse,
       |    count(DISTINCT c_custkey) AS k_size,
       |    count(DISTINCT o_orderpriority) AS l_div
       |  FROM rows1 GROUP BY 1, 2, 3),
       |rows2 AS (
       |  SELECT r.* FROM rows1 r
       |  JOIN g1 ON r.qi_nation = g1.qi_nation AND r.qi_seg = g1.qi_seg
       |    AND r.band_coarse = g1.band_coarse
       |  WHERE g1.k_size < $kk OR g1.l_div < $ll),
       |g2 AS (
       |  SELECT qi_nation, qi_seg,
       |    count(DISTINCT c_custkey) AS k_size,
       |    count(DISTINCT o_orderpriority) AS l_div
       |  FROM rows2 GROUP BY 1, 2)
       |SELECT qi_nation, qi_seg, band_fine AS attr, 0 AS level,
       |  k_size, l_div, false AS risky
       |FROM g0 WHERE k_size >= $kk AND l_div >= $ll
       |UNION ALL
       |SELECT qi_nation, qi_seg, band_coarse AS attr, 1 AS level,
       |  k_size, l_div, false AS risky
       |FROM g1 WHERE k_size >= $kk AND l_div >= $ll
       |UNION ALL
       |SELECT qi_nation, qi_seg, NULL AS attr, 2 AS level,
       |  k_size, l_div, (k_size < $kk OR l_div < $ll) AS risky
       |FROM g2""".stripMargin
  }

  /** Leakage-safe train/val/test split: split membership is a hash of
    * the near-duplicate CLUSTER id, not the document id — every
    * transitive near-dup lands in the same split, so no eval document
    * has a training-set twin (the contamination mode a per-document
    * split cannot prevent: ~5% of pairs straddle any 80/10/10 doc-id
    * split). Composes [[Dedup.duplicateClusters]] with
    * [[graft.ops.Sampling.deterministicSplit]]; the oracle replays the
    * full cluster closure and the same hash coordinate on cluster_id.
    */
  def qLeakSplit(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.deterministicSplit(
      Dedup.duplicateClusters(Tables.documents(s, d), "doc_id", "text"),
      "cluster_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"))

  val qLeakSplitSql: String = {
    val u = graft.ops.Sampling.coordinateSql("cluster_id")
    s"""SELECT split, count(*) AS n_docs,
       |  count(distinct cluster_id) AS n_clusters
       |FROM (
       |  SELECT cluster_id,
       |    CASE WHEN $u < 0.8 THEN 'train'
       |         WHEN $u < ${0.8 + 0.1} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM ($qDupClustersSql) c)
       |GROUP BY 1""".stripMargin
  }

  /** Contrastive negative sampling: every document paired with k=2
    * deterministic pseudo-random partners from a COUNT-capped
    * hash-selected pool (see [[graft.ops.Sampling.negativeSample]]) —
    * membership and picks are pure functions of the data, so the
    * oracle replays pool selection and slot assignment bit-for-bit
    * from the shared md5-hash formulas (pool = the 64 smallest
    * coordinates, slots in coordinate order).
    */
  def qNegSample(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.negativeSample(
      Tables.documents(s, d), "doc_id", k = 2, poolSize = 64)

  val qNegSampleSql: String = {
    val u = graft.ops.Sampling.coordinateSql("doc_id")
    val h = graft.ops.Sampling.hash60Sql(
      "cast(doc_id as varchar) || ':' || cast(neg_idx as varchar)")
    s"""WITH ids AS (SELECT DISTINCT doc_id FROM documents),
       |ranked AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY $u, doc_id) AS slot
       |  FROM ids),
       |pool AS (SELECT doc_id, slot FROM ranked WHERE slot <= 64),
       |m AS (SELECT count(*) AS mx FROM pool),
       |c AS (
       |  SELECT d.doc_id, i.neg_idx, $h % m.mx + 1 AS slot
       |  FROM ids d CROSS JOIN m
       |  CROSS JOIN (VALUES (1), (2)) AS i(neg_idx))
       |SELECT c.doc_id, cast(c.neg_idx as bigint) AS neg_idx,
       |  p.doc_id AS neg_doc_id
       |FROM c JOIN pool p USING (slot)
       |WHERE c.doc_id <> p.doc_id""".stripMargin
  }

  /** Deterministic training-order shuffle: every document mapped to a
    * (shard, shard_pos) coordinate by two independent keyed hashes
    * (see [[graft.ops.Sampling.shuffleShards]]) — the seekable
    * pseudo-random permutation a dataloader consumes. The oracle
    * replays both hashes and the per-shard dense numbering.
    */
  def qShuffleShards(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.shuffleShards(
      Tables.documents(s, d).select(col("doc_id")), "doc_id", numShards = 8)

  val qShuffleShardsSql: String = {
    val hs = graft.ops.Sampling.hash60Sql("'shard:' || cast(doc_id as varchar)")
    val ho = graft.ops.Sampling.hash60Sql("'ord:' || cast(doc_id as varchar)")
    s"""WITH t AS (
       |  SELECT doc_id, $hs % 8 AS shard, $ho AS ord FROM documents)
       |SELECT doc_id, cast(shard as int) AS shard,
       |  row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS shard_pos
       |FROM t""".stripMargin
  }

  /** Global dense ids 0..N-1 without a global sort
    * ([[graft.ops.Sampling.assignDenseIds]]): per-shard offsets +
    * within-shard dense positions. The oracle replays it as the ONE
    * global row_number the operator deliberately avoids.
    */
  def qDenseIds(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.assignDenseIds(
      Tables.documents(s, d).select(col("doc_id")), "doc_id", numShards = 8)

  val qDenseIdsSql: String = {
    val hs = graft.ops.Sampling.hash60Sql("'shard:' || cast(doc_id as varchar)")
    val ho = graft.ops.Sampling.hash60Sql("'ord:' || cast(doc_id as varchar)")
    s"""WITH t AS (
       |  SELECT doc_id, $hs % 8 AS shard, $ho AS ord FROM documents)
       |SELECT doc_id, cast(shard as int) AS shard,
       |  row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id)
       |    AS shard_pos,
       |  row_number() OVER (ORDER BY shard, ord, doc_id) - 1 AS dense_id
       |FROM t""".stripMargin
  }

  /** Rendezvous routing: every document assigned to the named shard
    * with the highest keyed weight (see
    * [[graft.ops.Sampling.rendezvousShard]]); the oracle replays the
    * per-(key, shard) weights and the (weight, shard)-max pick.
    */
  def qRendezvous(s: SparkSession, d: String): DataFrame =
    graft.ops.Sampling.rendezvousShard(
      Tables.documents(s, d).select(col("doc_id")), "doc_id",
      Seq("ingest-a", "ingest-b", "ingest-c", "ingest-d"))

  val qRendezvousSql: String = {
    val w = graft.ops.Sampling.hash60Sql(
      "s.shard || ':' || cast(doc_id as varchar)")
    s"""WITH ks AS (SELECT doc_id FROM documents),
       |w AS (
       |  SELECT doc_id, s.shard, $w AS wt
       |  FROM ks CROSS JOIN (VALUES ('ingest-a'), ('ingest-b'),
       |    ('ingest-c'), ('ingest-d')) AS s(shard)),
       |r AS (
       |  SELECT doc_id, shard, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY wt DESC, shard DESC) AS rn
       |  FROM w)
       |SELECT doc_id, shard FROM r WHERE rn = 1""".stripMargin
  }

  /** Incremental dedup: the odd-id half of the corpus ingested AGAINST
    * the even-id half as the existing reference — survivors are
    * incoming docs with no exact or near duplicate in the reference
    * (in-batch duplicates deliberately kept).
    */
  def qDedupIncr(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Dedup.dropDuplicatesAgainst(
      docs.filter(col("doc_id") % 2 === 1),
      docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text")
      .select(col("doc_id"), col("source"))
  }

  val qDedupIncrSql: String = {
    s"""WITH t AS (SELECT doc_id, source, md5($normSql) AS fp, $toksSql AS toks
       |           FROM documents),
       |inc AS (SELECT * FROM t WHERE doc_id % 2 = 1),
       |ref AS (SELECT * FROM t WHERE doc_id % 2 = 0),
       |exsurv AS (
       |  -- NOT EXISTS, not NOT IN: the Spark side is a left_anti join,
       |  -- which KEEPS a null-fp incoming row (null matches nothing),
       |  -- while NOT IN over a subquery containing any NULL returns
       |  -- zero rows — the two diverge on corpora with null text.
       |  SELECT * FROM inc
       |  WHERE NOT EXISTS (SELECT 1 FROM ref WHERE ref.fp = inc.fp)),
       |increp AS (SELECT fp, min(doc_id) AS doc_id FROM exsurv GROUP BY 1),
       |refrep AS (SELECT fp, min(doc_id) AS doc_id FROM ref GROUP BY 1),
       |isg AS (
       |  SELECT e.fp, ${shinglesSql("e.toks")} AS grams
       |  FROM exsurv e JOIN increp USING (fp, doc_id)),
       |rsg AS (
       |  SELECT r.doc_id, ${shinglesSql("r.toks")} AS grams
       |  FROM ref r JOIN refrep USING (fp, doc_id)),
       |isigs AS (SELECT fp, ${minhashSql("grams")} AS sig FROM isg),
       |rsigs AS (SELECT doc_id, ${minhashSql("grams")} AS sig FROM rsg),
       |ibuckets AS (${bandSelectsSql("isigs", "fp")}),
       |rbuckets AS (${bandSelectsSql("rsigs", "doc_id")}),
       |dropfp AS (
       |  SELECT DISTINCT a.fp
       |  FROM ibuckets a JOIN rbuckets b ON a.bucket = b.bucket
       |  WHERE len(list_filter(range(1, ${Dedup.minhashCoeffs.size} + 1),
       |        i -> a.sig[i] = b.sig[i])) * 1.0 / ${Dedup.minhashCoeffs.size} >= 0.75)
       |SELECT doc_id, source FROM exsurv
       |WHERE NOT EXISTS (SELECT 1 FROM dropfp WHERE dropfp.fp = exsurv.fp)""".stripMargin
  }

  /** 60-bit SimHash fingerprints (native kernel). */
  def qSimhash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"), Dedup.simhash(col("text")).as("simhash"))

  /** DuckDB CTE computing (doc_id, simhash) — shared by the
    * fingerprint and candidate-pair oracles.
    */
  private val simhashCteSql: String = {
    val terms = (0 until Dedup.simhashBits).map { k =>
      s"""(CASE WHEN list_sum(list_transform(hs,
         |   h -> CASE WHEN (h >> $k) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         | THEN cast(${1L << k} as bigint) ELSE 0 END)""".stripMargin
    }.mkString(" +\n")
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |h AS (SELECT doc_id, list_transform(toks, tk -> ${hash60Sql("tk")}) AS hs FROM t),
       |sh AS (SELECT doc_id, $terms AS simhash FROM h)""".stripMargin
  }

  val qSimhashSql: String =
    s"""WITH $simhashCteSql
       |SELECT doc_id, simhash FROM sh""".stripMargin

  /** SimHash near-dup pairs (hamming ≤ 3) via the pigeonhole band
    * blocking — the pair-generation complement to q_simhash.
    */
  def qSimhashPairs(s: SparkSession, d: String): DataFrame =
    Dedup.simhashCandidates(Tables.documents(s, d), "doc_id", "text",
      maxHamming = 3)

  val qSimhashPairsSql: String = {
    val bands = Dedup.simhashBandLayout(maxHamming = 3).zipWithIndex.map {
      case ((shift, width), b) =>
        s"""SELECT doc_id, simhash,
           |  '$b' || '_' || ((simhash >> $shift) & ${(1L << width) - 1})
           |    AS bucket FROM sh""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $simhashCteSql,
       |banded AS (
       |$bands)
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  bit_count(xor(a.simhash, b.simhash)) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.bucket = b.bucket AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin
  }

  /** n-gram Jaccard near-dup pairs, blocked by (source, length bucket) —
    * the length bucket bounds pair count at scale (near-dups have
    * near-equal length).
    */
  def qNgramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(
      Tables.documents(s, d)
        .withColumn("len_bucket", floor(col("n_chars") / 200)),
      "doc_id", "text", blockCols = Seq("source", "len_bucket"), threshold = 0.2)

  val qNgramJaccardSql: String =
    s"""WITH t AS (SELECT doc_id, source, cast(floor(n_chars / 200) as bigint) AS len_bucket,
       |           $toksSql AS toks FROM documents),
       |g AS (SELECT doc_id, source, len_bucket, ${shinglesSql("toks")} AS grams FROM t)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  round(len(list_intersect(a.grams, b.grams)) * 1.0 /
       |        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))),
       |        6) AS jaccard
       |FROM g a JOIN g b ON a.source = b.source AND a.len_bucket = b.len_bucket
       |  AND a.doc_id < b.doc_id
       |WHERE round(len(list_intersect(a.grams, b.grams)) * 1.0 /
       |        (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))),
       |        6) >= 0.2""".stripMargin

  /** Exact all-pairs Jaccard ≥ 0.9 over distinct hashed whitespace
    * tokens via prefix filtering ([[graft.dedup.AllPairs]]) — the
    * no-false-negative dedup pass (vs q_minhash_pairs' probabilistic
    * recall). The oracle brute-forces candidates from the full token
    * postings; the engine's prefix filter must reproduce it exactly.
    * 0.9 is the production near-dup bar; on this synthetic corpus it
    * also keeps output quadratics at bay (the generator's shared
    * vocabulary puts >70% of ALL pairs above jaccard 0.5).
    */
  def qAllPairs(s: SparkSession, d: String): DataFrame =
    graft.dedup.AllPairs.pairs(Tables.documents(s, d), "doc_id", "text",
      threshold = 0.9)

  val qAllPairsSql: String =
    s"""WITH t AS (SELECT doc_id,
       |  list_distinct(list_transform($toksSql,
       |    tk -> ${hash60Sql("tk")} % 2147483647)) AS hs FROM documents),
       |e AS (SELECT doc_id, u.h FROM t, unnest(hs) AS u(h)),
       |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM e a JOIN e b ON a.h = b.h AND a.doc_id < b.doc_id),
       |j AS (SELECT id_a, id_b,
       |    len(list_intersect(ta.hs, tb.hs)) * 1.0 /
       |      (len(ta.hs) + len(tb.hs) - len(list_intersect(ta.hs, tb.hs)))
       |      AS jac
       |  FROM cand JOIN t ta ON id_a = ta.doc_id
       |    JOIN t tb ON id_b = tb.doc_id)
       |SELECT id_a, id_b, round(jac, 6) AS jaccard FROM j
       |WHERE jac >= 0.9""".stripMargin

  /** Count-min token-frequency estimates for the 20 most frequent
    * tokens (exact counts alongside; est ≥ exact by construction).
    * Deterministic cross-engine like the other sketches.
    */
  def qCmsTokens(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.CountMin
    val toks = Tables.documents(s, d)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok").asc).limit(20)
    CountMin.estimate(toks, exact.select(col("tok")), Seq.empty, "tok", w = 256)
      .join(exact, Seq("tok"))
      .select(col("tok"), col("n_exact"), col("est_count"))
  }

  val qCmsTokensSql: String =
    graft.sketch.CountMin.tokenOracleSql("documents", "text", w = 256, topN = 20)

  /** GROUPED count-min estimates: each of the 10 globally most
    * frequent tokens estimated against every source's own counter
    * table — the per-group sketch contract (absent counters → 0,
    * one-sided error per group, not across groups).
    */
  def qCmsGrouped(s: SparkSession, d: String): DataFrame = {
    import graft.sketch.CountMin
    val toks = Tables.documents(s, d)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val items = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok").asc).limit(10)
      .select(col("tok"))
    CountMin.estimate(toks, items, Seq("source"), "tok", w = 256)
      .select(col("tok"), col("source"), col("est_count"))
  }

  val qCmsGroupedSql: String =
    graft.sketch.CountMin.groupedTokenOracleSql(
      "documents", "text", "source", w = 256, topN = 10)

  /** TF-IDF cosine similar-pairs over a df-capped vocabulary:
    * fixed-point weights → exact decimal dots/norms → one rounded
    * double division per pair (see [[graft.sim.TfIdf]]).
    */
  def qTfidfPairs(s: SparkSession, d: String): DataFrame =
    graft.sim.TfIdf.similarPairs(Tables.documents(s, d), "doc_id", "text",
      threshold = 0.3, maxDf = 100)

  val qTfidfPairsSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, u.tok FROM documents, unnest($toksSql) AS u(tok)),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
       |nd AS (SELECT count(*) AS n FROM documents),
       |vocab AS (
       |  SELECT tok, count(*) AS df_t FROM tf GROUP BY 1
       |  HAVING count(*) <= 100),
       |w AS (
       |  SELECT doc_id, tok,
       |    cast(floor(tf * round(ln((n + 1.0) / (df_t + 1.0)) + 1.0, 6)
       |      * ${graft.sim.TfIdf.Scale} + 0.5) as bigint) AS w
       |  FROM tf JOIN vocab USING (tok) CROSS JOIN nd),
       |nrm AS (SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY 1),
       |dots AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
       |  FROM w a JOIN w b ON a.tok = b.tok AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT id_a, id_b,
       |    round(cast(dot as double) /
       |      (sqrt(cast(na.n2 as double)) * sqrt(cast(nb.n2 as double))), 6)
       |      AS cos_sim
       |  FROM dots
       |  JOIN nrm na ON na.doc_id = id_a
       |  JOIN nrm nb ON nb.doc_id = id_b)
       |SELECT id_a, id_b, cos_sim FROM scored WHERE cos_sim >= 0.3""".stripMargin

  // ---------------------------------------------------------- similarity

  /** Brute-force cosine top-3 for a small query set (vec_id < 8). */
  /** Per-dimension embedding statistics ([[graft.sim.VecStats]]) —
    * the quantizer-preprocessing pass: centering means, variances for
    * subspace balance, SQ dynamic ranges. One pass, dim-bounded
    * output; oracle replays the 6/9dp quantization + decimal sums.
    */
  def qDimStats(s: SparkSession, d: String): DataFrame =
    graft.sim.VecStats.dimStats(Tables.embeddings(s, d), "embedding")

  val qDimStatsSql: String =
    """WITH c AS (
      |  SELECT u.d AS dim, cast(u.x as double) AS x
      |  FROM (SELECT unnest(list_transform(range(1, len(embedding) + 1),
      |          i -> {'d': i - 1, 'x': embedding[i]})) AS u
      |        FROM embeddings)
      |  WHERE u.x IS NOT NULL),
      |g AS (
      |  SELECT dim, count(*) AS n,
      |    sum(cast(round(x, 6) as decimal(18,6))) AS s1,
      |    sum(cast(round(x * x, 9) as decimal(27,9))) AS s2,
      |    min(x) AS lo, max(x) AS hi
      |  FROM c GROUP BY 1),
      |m AS (SELECT dim, n, round(cast(s1 as double) / n, 6) AS mean,
      |        s2, lo, hi FROM g)
      |SELECT dim, n, mean,
      |  round(greatest(cast(s2 as double) / n - mean * mean, 0), 6)
      |    AS variance,
      |  lo, hi
      |FROM m""".stripMargin

  def qAnnTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.bruteForceTopK(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  val qAnnTopKSql: String = {
    // dot products fold left-to-right via list_reduce to match Spark's
    // functions.aggregate exactly (bit-for-bit double math)
    def dot(a: String, b: String) =
      s"""list_reduce(list_prepend(cast(0 as double),
         |  list_transform(range(1, len($a) + 1),
         |    i -> cast($a[i] as double) * cast($b[i] as double))),
         |  (acc, v) -> acc + v)""".stripMargin
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
       |sims AS (
       |  SELECT query_id, neighbor_id,
       |    CASE WHEN sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")}) > 0
       |      THEN ${dot("qv", "cv")} /
       |           (sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")}))
       |      ELSE 0.0 END AS sim_raw
       |  FROM c CROSS JOIN q
       |  WHERE neighbor_id <> query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim_raw,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim_raw DESC, neighbor_id ASC) AS rank
       |  FROM sims)
       |SELECT query_id, neighbor_id, round(sim_raw, 6) AS sim, rank
       |FROM ranked WHERE rank <= 3""".stripMargin
  }

  /** LSH-bucketed approximate top-3 — the hyperplanes are deterministic
    * constants shared with the oracle SQL (inlined literal arrays), so
    * even the approximate path is hash-verified.
    */
  def qAnnLsh(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.lshBucketTopK(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  val qAnnLshSql: String = {
    // bucket key: sign bit per plane, matching Ann.lshKey's left-fold dot
    val keyExpr = lshKeySql("embedding", 8)
    def dot(a: String, b: String) = listDotSql(a, b)
    s"""WITH keyed AS (
       |  SELECT vec_id, embedding, $keyExpr AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, bucket
       |      FROM keyed WHERE vec_id < 8),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM keyed),
       |sims AS (
       |  SELECT query_id, neighbor_id,
       |    CASE WHEN sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")}) > 0
       |      THEN ${dot("qv", "cv")} /
       |           (sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")}))
       |      ELSE 0.0 END AS sim_raw
       |  FROM c JOIN q USING (bucket)
       |  WHERE neighbor_id <> query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim_raw,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim_raw DESC, neighbor_id ASC) AS rank
       |  FROM sims)
       |SELECT query_id, neighbor_id, round(sim_raw, 6) AS sim, rank
       |FROM ranked WHERE rank <= 3""".stripMargin
  }

  /** Multi-probe LSH approximate top-3: the query probes its own sign
    * bucket plus the 8 Hamming-1 buckets — the recall repair without
    * extra hash tables, hash-verified like the single-bucket path.
    */
  def qAnnMultiprobe(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.lshMultiProbeTopK(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  val qAnnMultiprobeSql: String = {
    val h = 8
    val keyExpr = lshKeySql("embedding", h)
    def dot(a: String, b: String) = listDotSql(a, b)
    s"""WITH keyed AS (
       |  SELECT vec_id, embedding, $keyExpr AS bucket FROM embeddings),
       |q AS (
       |  SELECT vec_id AS query_id, embedding AS qv,
       |    unnest(list_distinct(list_prepend(bucket,
       |      list_transform(range(1, $h + 1), i ->
       |        substr(bucket, 1, cast(i - 1 as bigint)) ||
       |        (CASE WHEN substr(bucket, cast(i as bigint), 1) = '1'
       |          THEN '0' ELSE '1' END) ||
       |        substr(bucket, cast(i + 1 as bigint), $h))))) AS bucket
       |  FROM keyed WHERE vec_id < 8),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM keyed),
       |sims AS (
       |  SELECT query_id, neighbor_id,
       |    CASE WHEN sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")}) > 0
       |      THEN ${dot("qv", "cv")} /
       |           (sqrt(${dot("qv", "qv")}) * sqrt(${dot("cv", "cv")}))
       |      ELSE 0.0 END AS sim_raw
       |  FROM c JOIN q USING (bucket)
       |  WHERE neighbor_id <> query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim_raw,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim_raw DESC, neighbor_id ASC) AS rank
       |  FROM sims)
       |SELECT query_id, neighbor_id, round(sim_raw, 6) AS sim, rank
       |FROM ranked WHERE rank <= 3""".stripMargin
  }

  /** Recall@k + reciprocal rank of the single-bucket LSH run against
    * the exact brute-force answer on the same 8 queries — the ANN
    * tuning loop as a first-class, hash-verified query.
    */
  def qAnnRecall(s: SparkSession, d: String): DataFrame =
    graft.sim.RetrievalEval.vsExact(qAnnTopK(s, d), qAnnLsh(s, d))

  // lazy: composes qAnnTopKSql/qAnnLshSql, and qAnnTopKSql is
  // declared later in the object
  lazy val qAnnRecallSql: String =
    s"""WITH ex AS (
       |$qAnnTopKSql),
       |ap AS (
       |$qAnnLshSql),
       |j AS (SELECT ex.query_id, ex.neighbor_id, ap.rank AS ap_rank
       |      FROM ex LEFT JOIN ap USING (query_id, neighbor_id))
       |SELECT query_id, count(*) AS n_exact,
       |  cast(sum(CASE WHEN ap_rank IS NOT NULL THEN 1 ELSE 0 END) as bigint)
       |    AS n_hit,
       |  round(cast(sum(CASE WHEN ap_rank IS NOT NULL THEN 1 ELSE 0 END)
       |      as double) / cast(count(*) as double), 6) AS recall,
       |  round(coalesce(1.0 / cast(min(ap_rank) as double), 0.0), 6) AS rr
       |FROM j GROUP BY 1""".stripMargin

  /** IVF-Flat approximate top-3: deterministic sampled centroids,
    * nprobe-cell search — the inverted-file scale path next to the LSH
    * one. Everything (assignment, probing, scoring) is left-fold dot
    * products, so even the cell partitioning is hash-verified.
    */
  def qAnnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Ann.ivfTopK(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 3, nlist = 16, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  val qAnnIvfSql: String = {
    def dot(a: String, b: String) =
      s"""list_reduce(list_prepend(cast(0 as double),
         |  list_transform(range(1, len($a) + 1),
         |    i -> cast($a[i] as double) * cast($b[i] as double))),
         |  (acc, v) -> acc + v)""".stripMargin
    def cos(a: String, b: String) =
      s"""CASE WHEN sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}) > 0
         |  THEN ${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))
         |  ELSE 0.0 END""".stripMargin
    s"""WITH cent AS (
       |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  ORDER BY cast(('0x' || substr(md5(cast(vec_id as varchar)), 1, 15)) as bigint),
       |           vec_id
       |  LIMIT 16),
       |asg AS (
       |  SELECT neighbor_id, cvec, cid FROM (
       |    SELECT e.vec_id AS neighbor_id, e.embedding AS cvec, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cos("e.embedding", "c.cv")} DESC, c.cid ASC) AS r
       |    FROM embeddings e CROSS JOIN cent c) WHERE r = 1),
       |probe AS (
       |  SELECT query_id, qvec, cid FROM (
       |    SELECT q.vec_id AS query_id, q.embedding AS qvec, c.cid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cos("q.embedding", "c.cv")} DESC, c.cid ASC) AS r
       |    FROM embeddings q CROSS JOIN cent c WHERE q.vec_id < 8) WHERE r <= 4),
       |sims AS (
       |  SELECT query_id, neighbor_id, ${cos("qvec", "cvec")} AS sim_raw
       |  FROM probe JOIN asg USING (cid)
       |  WHERE neighbor_id <> query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim_raw,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim_raw DESC, neighbor_id ASC) AS rank
       |  FROM sims)
       |SELECT query_id, neighbor_id, round(sim_raw, 6) AS sim, rank
       |FROM ranked WHERE rank <= 3""".stripMargin
  }

  /** Embedding-cosine near-dup pairs at the SCALED blocking config
    * (3 tables × 12 sign planes = 4,096 buckets per table,
    * OR-amplified for recall), rounded-cosine threshold — the
    * semantic-dedup complement to the shingle-based paths. The corpus
    * has no true duplicates, so the threshold sits at the top of the
    * observed similarity range to exercise a non-trivial result
    * (14 surviving pairs at sf0.01).
    */
  def qEmbedDup(s: SparkSession, d: String): DataFrame =
    Dedup.embeddingNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
      threshold = 0.35)

  val qEmbedDupSql: String = {
    val numPlanes = 12
    val numTables = 3
    def planeLit(p: Seq[Double]) = p.mkString("[", ",", "]")
    def dotPlane(v: String, p: Seq[Double]) =
      s"""list_reduce(list_prepend(cast(0 as double),
         |  list_transform(range(1, 65),
         |    i -> cast($v[i] as double) * (${planeLit(p)})[i])),
         |  (acc, x) -> acc + x)""".stripMargin
    // table t's bucket key: sign pattern over planes [t*12, (t+1)*12),
    // prefixed with the table index — same layout as
    // Dedup.embeddingNearDupPairs
    def keyExpr(t: Int) = {
      val signs = (0 until numPlanes).map { i =>
        val p = Ann.hyperplane(t * numPlanes + i, 64)
        s"(CASE WHEN ${dotPlane("embedding", p)} >= 0 THEN '1' ELSE '0' END)"
      }.mkString(" || ")
      s"'$t' || '_' || ($signs)"
    }
    val tableSelects = (0 until numTables).map { t =>
      s"SELECT vec_id, embedding, ${keyExpr(t)} AS bucket FROM embeddings"
    }.mkString("\nUNION ALL\n")
    def dot(a: String, b: String) =
      s"""list_reduce(list_prepend(cast(0 as double),
         |  list_transform(range(1, len($a) + 1),
         |    i -> cast($a[i] as double) * cast($b[i] as double))),
         |  (acc, v) -> acc + v)""".stripMargin
    def cos(a: String, b: String) =
      s"""CASE WHEN sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}) > 0
         |  THEN ${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))
         |  ELSE 0.0 END""".stripMargin
    s"""WITH keyed AS (
       |$tableSelects),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       |    round(${cos("a.embedding", "b.embedding")}, 6) AS cos_sim
       |  FROM keyed a JOIN keyed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= 0.35""".stripMargin
  }

  /** Deterministic Lloyd's k-means over the embedding corpus — the
    * semantic-clustering stage (cluster first, pairwise within clusters
    * only). Even the ITERATIVE trainer is hash-verified against DuckDB:
    * the integer-quantized centroid update makes every iteration
    * order-independent, so three full Lloyd rounds replay exactly in
    * SQL.
    */
  def qKmeans(s: SparkSession, d: String): DataFrame =
    graft.sim.KMeans.fitAssign(Tables.embeddings(s, d), "vec_id", "embedding",
      k = 8, iters = 3)

  /** Unrolled-Lloyd CTE prologue shared by the k-means and SemDeDup
    * oracles: a complete `WITH` list ending at `asg{iters+1}`, the
    * final (vec_id, x, cluster, dist2) assignment. Callers append
    * either a bare `SELECT` or further `,`-separated CTEs.
    */
  /** `trainWhere`: optional vec_id predicate restricting the TRAINING
    * rows (init draw + every Lloyd round) to a deterministic
    * hash-sample, while the final assignment CTE still covers the full
    * corpus — the bounded-sample training contract quantizer training
    * uses at scale (see the q_pq_* scaladocs).
    */
  /** `kLimitSql`: optional SQL expression overriding the literal `k`
    * in the init draw's LIMIT — lets an oracle derive k from the data
    * (a scalar subquery) exactly as the engine does, so the SQL stays
    * correct at EVERY scale factor instead of baking in one SF's k.
    */
  private def kmeansCtes(k: Int, iters: Int,
      trainWhere: Option[String] = None,
      kLimitSql: Option[String] = None): String = {
    // left-fold dot of two 64-dim lists, matching graft.functions.DotFold
    def dot(a: String, b: String) =
      s"""list_reduce(list_prepend(cast(0 as double),
         |      list_transform(range(1, 65),
         |        i -> cast($a[i] as double) * cast($b[i] as double))),
         |      (acc, v) -> acc + v)""".stripMargin
    // one Lloyd round: nearest-centroid assignment (ties to the lower
    // cluster id), then per-(cluster, dim) exact integer mean update;
    // clusters that attract no rows keep their previous centroid
    val tBase = if (trainWhere.isDefined) "tb" else "b"
    def asg(n: Int, cent: String, base: String) =
      s"""asg$n AS (
         |  SELECT vec_id, x, cluster, dist2 FROM (
         |    SELECT vec_id, x, cluster, dist2,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY dist2 ASC, cluster ASC) AS r
         |    FROM (SELECT b.vec_id, b.x, c.cluster,
         |            b.xx - 2 * ${dot("b.x", "c.cv")} + ${dot("c.cv", "c.cv")} AS dist2
         |          FROM $base b CROSS JOIN $cent c))
         |  WHERE r = 1)""".stripMargin
    def upd(n: Int) =
      s"""upd$n AS (
         |  SELECT cluster, d.i AS dim,
         |    sum(cast(round(cast(x[d.i] as double) * ${graft.sim.KMeans.Scale}) as bigint)) AS sq,
         |    count(*) AS cnt
         |  FROM asg$n, unnest(range(1, 65)) AS d(i)
         |  GROUP BY cluster, d.i),
         |cent$n AS (
         |  SELECT c.cluster,
         |    CASE WHEN min(u.dim) IS NULL THEN c.cv
         |         ELSE list(cast(u.sq as double) / u.cnt / ${graft.sim.KMeans.Scale}.0
         |                   ORDER BY u.dim) END AS cv
         |  FROM cent${n - 1} c LEFT JOIN upd$n u USING (cluster)
         |  GROUP BY c.cluster, c.cv)""".stripMargin
    val rounds = (1 to iters).map(n => s"${asg(n, s"cent${n - 1}", tBase)},\n${upd(n)}")
      .mkString(",\n")
    val tb = trainWhere
      .map(w => s"\ntb AS (SELECT * FROM b WHERE $w),").getOrElse("")
    s"""WITH b AS (
       |  SELECT vec_id, embedding AS x, ${dot("embedding", "embedding")} AS xx
       |  FROM embeddings),$tb
       |cent0 AS (
       |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cluster, x AS cv
       |  FROM (SELECT vec_id, x,
       |          cast(('0x' || substr(md5(cast(vec_id as varchar)), 1, 15)) as bigint) AS h
       |        FROM $tBase ORDER BY h, vec_id LIMIT ${kLimitSql.getOrElse(k.toString)})),
       |$rounds,
       |${asg(iters + 1, s"cent$iters", "b")}""".stripMargin
  }

  val qKmeansSql: String =
    s"""${kmeansCtes(8, 3)}
       |SELECT vec_id, cluster, round(greatest(dist2, 0.0), 6) AS dist2
       |FROM asg4""".stripMargin

  /** Clustering-quality eval: per-cluster label purity (majority-label
    * share against the embeddings' ground-truth label column) plus the
    * corpus-level purity — the MEASURED answer to "did k-means find
    * the label structure", the same close-the-loop discipline as
    * q_ann_recall/q_calibration. Majority pick is the integer
    * struct-max (count desc, label asc), purity one rounded division;
    * the oracle replays the full Lloyd training (kmeansCtes) and the
    * eval. Scale: the eval adds one broadcast label join and a
    * k-row aggregation on top of the assignment pass.
    */
  def qClusterPurity(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val asg = graft.sim.KMeans.fitAssign(emb, "vec_id", "embedding",
      k = 8, iters = 3).select(col("vec_id"), col("cluster"))
    val counts = asg
      .join(emb.select(col("vec_id"), col("label").cast("long").as("label")),
        Seq("vec_id"))
      .groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("c"))
    val per = counts.groupBy(col("cluster"))
      .agg(sum(col("c")).as("n"),
        max(struct(col("c"), (-col("label")).as("nl"))).as("w"))
      .select(col("cluster"), col("n"),
        (-col("w.nl")).as("major_label"), col("w.c").as("major_n"),
        round(col("w.c").cast("double") / col("n").cast("double"), 6)
          .as("purity"))
    val overall = per.agg(sum(col("major_n")).as("sm"), sum(col("n")).as("sn"))
      .select(round(col("sm").cast("double") / col("sn").cast("double"), 6)
        .as("overall_purity"))
    per.crossJoin(broadcast(overall))
  }

  val qClusterPuritySql: String =
    s"""${kmeansCtes(8, 3)},
       |lab AS (
       |  SELECT a.cluster, CAST(e.label AS BIGINT) AS label
       |  FROM asg4 a JOIN embeddings e USING (vec_id)),
       |cnt AS (SELECT cluster, label, count(*) AS c FROM lab GROUP BY 1, 2),
       |mj AS (SELECT cluster, label AS major_label, c AS major_n FROM (
       |  SELECT cluster, label, c, row_number() OVER (PARTITION BY cluster
       |    ORDER BY c DESC, label ASC) AS rn FROM cnt) WHERE rn = 1),
       |tot AS (SELECT cluster, CAST(sum(c) AS BIGINT) AS n
       |        FROM cnt GROUP BY 1),
       |ov AS (SELECT round(CAST(sum(major_n) AS DOUBLE) /
       |         CAST(sum(n) AS DOUBLE), 6) AS overall_purity
       |       FROM mj JOIN tot USING (cluster))
       |SELECT t.cluster, t.n, m.major_label, CAST(m.major_n AS BIGINT)
       |    AS major_n,
       |  round(CAST(m.major_n AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS purity,
       |  ov.overall_purity
       |FROM tot t JOIN mj m USING (cluster) CROSS JOIN ov""".stripMargin

  /** IVF index APPEND — the index-maintenance primitive a 100 TB
    * embedding store lives on: new vectors (the odd-vec_id delta) are
    * assigned into an index whose coarse centroids were trained on
    * the EXISTING corpus (the even-vec_id half) WITHOUT retraining —
    * training cost is paid once per index epoch, and a delta batch is
    * one narrow literal-centroid argmin pass over the delta alone (no
    * shuffle, no join, no touch of the existing corpus). The oracle
    * replays the even-half training and the odd-half assignment
    * bit-for-bit.
    */
  def qIvfAppend(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val m = graft.sim.KMeans.fit(emb.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", k = 8, iters = 3)
    graft.sim.KMeans.assignDist(emb.filter(col("vec_id") % 2 === 1),
      "vec_id", "embedding", m)
  }

  val qIvfAppendSql: String =
    s"""${kmeansCtes(8, 3, Some("vec_id % 2 = 0"))}
       |SELECT vec_id, cluster, round(greatest(dist2, 0.0), 6) AS dist2
       |FROM asg4 WHERE vec_id % 2 = 1""".stripMargin

  /** One SUBSPACE's unrolled-Lloyd CTE chain for the PQ oracle —
    * [[kmeansCtes]] generalized to a `[start, start+w)` slice of the
    * embedding and `p`-prefixed CTE names so m independent chains can
    * share one WITH list. Returns the chain WITHOUT the leading WITH;
    * the final assignment CTE is `${p}asg${iters + 1}`.
    */
  private def pqSubspaceCtes(p: String, start: Int, w: Int, k: Int,
      iters: Int, src: String = "embeddings", vec: String = "embedding",
      trainWhere: Option[String] = None): String = {
    def dot(a: String, b: String) =
      s"""list_reduce(list_prepend(cast(0 as double),
         |      list_transform(range(1, ${w + 1}),
         |        i -> cast($a[i] as double) * cast($b[i] as double))),
         |      (acc, v) -> acc + v)""".stripMargin
    val tBase = if (trainWhere.isDefined) s"${p}tb" else s"${p}b"
    def asg(n: Int, cent: String, base: String) =
      s"""${p}asg$n AS (
         |  SELECT vec_id, x, cluster, dist2 FROM (
         |    SELECT vec_id, x, cluster, dist2,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY dist2 ASC, cluster ASC) AS r
         |    FROM (SELECT b.vec_id, b.x, c.cluster,
         |            b.xx - 2 * ${dot("b.x", "c.cv")} + ${dot("c.cv", "c.cv")} AS dist2
         |          FROM $base b CROSS JOIN $cent c))
         |  WHERE r = 1)""".stripMargin
    def upd(n: Int) =
      s"""${p}upd$n AS (
         |  SELECT cluster, d.i AS dim,
         |    sum(cast(round(cast(x[d.i] as double) * ${graft.sim.KMeans.Scale}) as bigint)) AS sq,
         |    count(*) AS cnt
         |  FROM ${p}asg$n, unnest(range(1, ${w + 1})) AS d(i)
         |  GROUP BY cluster, d.i),
         |${p}cent$n AS (
         |  SELECT c.cluster,
         |    CASE WHEN min(u.dim) IS NULL THEN c.cv
         |         ELSE list(cast(u.sq as double) / u.cnt / ${graft.sim.KMeans.Scale}.0
         |                   ORDER BY u.dim) END AS cv
         |  FROM ${p}cent${n - 1} c LEFT JOIN ${p}upd$n u USING (cluster)
         |  GROUP BY c.cluster, c.cv)""".stripMargin
    val rounds = (1 to iters)
      .map(n => s"${asg(n, s"${p}cent${n - 1}", tBase)},\n${upd(n)}")
      .mkString(",\n")
    val tb = trainWhere
      .map(w => s"\n${p}tb AS (SELECT * FROM ${p}b WHERE $w),").getOrElse("")
    s"""${p}b AS (
       |  SELECT vec_id, x, ${dot("x", "x")} AS xx
       |  FROM (SELECT vec_id,
       |          list_transform(range($start, ${start + w}),
       |            i -> cast($vec[i] as double)) AS x
       |        FROM $src)),$tb
       |${p}cent0 AS (
       |  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cluster, x AS cv
       |  FROM (SELECT vec_id, x,
       |          cast(('0x' || substr(md5(cast(vec_id as varchar)), 1, 15)) as bigint) AS h
       |        FROM $tBase ORDER BY h, vec_id LIMIT $k)),
       |$rounds,
       |${asg(iters + 1, s"${p}cent$iters", s"${p}b")}""".stripMargin
  }

  /** Deterministic 1-in-4 hash-sample of embedding rows, used as the
    * TRAINING set by every quantizer query (coarse k-means and PQ
    * codebooks) while encode/search always cover the full corpus.
    * This is the contract quantizer training has at scale: Lloyd
    * iterations over 100 TB of embeddings per index build is the wrong
    * shape — production systems fit codebooks on a bounded sample and
    * only ASSIGN the full corpus (one narrow literal-centroid pass
    * here). The sample is the same subset-invariant hash-coordinate
    * draw as [[graft.ops.Sampling]], so it replays in the oracle.
    */
  private val pqTrainWhereSql: String =
    s"${graft.ops.Sampling.hash60Sql("cast(vec_id as varchar)")} % 4 < 1"

  private def pqTrainSample(df: DataFrame): DataFrame =
    df.filter(
      graft.text.TextAnalysis.hash60(col("vec_id").cast(StringType)) % 4 < 1)

  /** Product-quantization encoding: each 64-dim embedding compressed
    * to 4 centroid codes (4 subspaces × 16 dims, k=4 codebooks trained
    * by 2 deterministic Lloyd rounds each) plus the summed
    * quantization error — the vector-compression layer of an IVF-PQ
    * ANN index. Codebooks train on the deterministic 1-in-4 sample
    * ([[pqTrainWhereSql]]); the encode covers every row. The oracle
    * replays all four subspace trainings AND the encode bit-for-bit,
    * so codebook init, integer-quantized updates, and tie-breaking are
    * hash-pinned end to end.
    */
  def qPqEncode(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val model = graft.sim.ProductQuantizer.fit(pqTrainSample(emb),
      "vec_id", "embedding", dims = 64, m = 4, k = 4, iters = 2)
    graft.sim.ProductQuantizer.encode(emb, "vec_id", "embedding", model)
  }

  val qPqEncodeSql: String = {
    val m = 4
    val chains = (0 until m)
      .map(j => pqSubspaceCtes(s"s${j}_", j * 16 + 1, 16, 4, 2,
        trainWhere = Some(pqTrainWhereSql)))
      .mkString(",\n")
    val code = (0 until m).map(j => s"cast(a$j.cluster as varchar)")
      .mkString(" || '-' || ")
    val err = (0 until m).map(j => s"greatest(a$j.dist2, 0.0)")
      .mkString(" + ")
    val joins = (1 until m).map(j => s"JOIN s${j}_asg3 a$j USING (vec_id)")
      .mkString(" ")
    s"""WITH $chains
       |SELECT a0.vec_id, $code AS code, round($err, 6) AS err
       |FROM s0_asg3 a0 $joins""".stripMargin
  }

  /** PQ asymmetric-distance top-10 (the query side of IVF-PQ): the
    * corpus ranked by summed per-subspace lookup-table distances to
    * the lowest-id embedding. Codebook training, the driver-computed
    * ADC tables, AND the top-10 ordering all replay exactly in the
    * oracle — the distance-table arithmetic is the same left-fold
    * formula in both engines, so even the rank boundary is hash-pinned.
    */
  def qPqAdc(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.orderBy(col("vec_id").asc).limit(1)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().head.getSeq[Double](0)
    val model = graft.sim.ProductQuantizer.fit(pqTrainSample(emb),
      "vec_id", "embedding", dims = 64, m = 4, k = 4, iters = 2)
    graft.sim.ProductQuantizer.adcTopK(emb, "vec_id", "embedding",
      model, q, n = 10)
  }

  /** Shared fragments of the PQ ADC oracles (4 subspaces × 16 dims):
    * the 4 unrolled subspace-training chains, the per-subspace ADC
    * distance-table CTEs (query slice vs every cent2 centroid), and
    * the code/distance/join expressions over the final assignments.
    */
  private def pqChains: String = (0 until 4)
    .map(j => pqSubspaceCtes(s"s${j}_", j * 16 + 1, 16, 4, 2,
      trainWhere = Some(pqTrainWhereSql)))
    .mkString(",\n")

  private def pqDTables: String = (0 until 4).map { j =>
    val sl = s"list_transform(range(${j * 16 + 1}, ${j * 16 + 17}), i -> cast(embedding[i] as double))"
    s"""d$j AS (
       |  SELECT c.cluster,
       |    q.qq - 2 * ${dotSql("q.x", "c.cv")} + ${dotSql("c.cv", "c.cv")} AS dval
       |  FROM s${j}_cent2 c CROSS JOIN (
       |    SELECT x, ${dotSql("x", "x")} AS qq
       |    FROM (SELECT $sl AS x FROM embeddings
       |          WHERE vec_id = (SELECT min(vec_id) FROM embeddings))) q)""".stripMargin
  }.mkString(",\n")

  private def pqCodeExpr: String = (0 until 4)
    .map(j => s"cast(a$j.cluster as varchar)").mkString(" || '-' || ")

  private def pqAdistExpr: String =
    (0 until 4).map(j => s"d$j.dval").mkString(" + ")

  private def pqJoins: String =
    (1 until 4).map(j => s"JOIN s${j}_asg3 a$j USING (vec_id)")
      .mkString(" ") + " " +
      (0 until 4).map(j => s"JOIN d$j ON a$j.cluster = d$j.cluster")
        .mkString(" ")

  val qPqAdcSql: String =
    // top-10 cut on the UNROUNDED distance (inner ORDER BY + LIMIT),
    // mirroring adcTopK; the outer projection only formats — an outer
    // ORDER BY would bind to the rounded alias and could flip the
    // rank boundary
    s"""WITH $pqChains,
       |$pqDTables
       |SELECT vec_id, code, round(greatest(adist, 0.0), 6) AS adist
       |FROM (
       |  SELECT a0.vec_id, $pqCodeExpr AS code, $pqAdistExpr AS adist
       |  FROM s0_asg3 a0 $pqJoins
       |  ORDER BY adist, vec_id LIMIT 10)""".stripMargin

  /** IVF-ADC search (the composed IVF-PQ query path): a coarse k=8
    * k-means partitions the corpus into cells, the query probes its
    * nprobe=3 nearest cells, and only vectors in those cells are
    * ADC-ranked — at production scale the cell filter is partition
    * pruning that skips (1 − nprobe/nlist) of the corpus before any
    * per-row work. Simplification vs textbook IVF-PQ, documented:
    * codes quantize the raw vectors, not the cell residuals, so one
    * global codebook serves every cell (the residual variant would
    * need per-cell oracle training chains). Coarse training, cell
    * probing, PQ training, and the rank boundary all replay exactly.
    */
  def qPqIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.orderBy(col("vec_id").asc).limit(1)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().head.getSeq[Double](0)
    val coarse = graft.sim.KMeans.fit(pqTrainSample(emb), "vec_id",
      "embedding", k = 8, iters = 3)
    val model = graft.sim.ProductQuantizer.fit(pqTrainSample(emb),
      "vec_id", "embedding", dims = 64, m = 4, k = 4, iters = 2)
    graft.sim.ProductQuantizer.ivfAdcTopK(emb, "vec_id", "embedding",
      coarse, model, q, nprobe = 3, n = 10)
  }

  /** IVF-PQ served from a PERSISTED index table — the write-once /
    * query-many path `q_pq_ivf`'s train-per-query shape grows into at
    * production scale. The index is built (or reused, when layout
    * version + hyperparameters + corpus fingerprint all match) as a
    * cell-partitioned parquet table of PQ codes plus a bounded model
    * table; the probe then loads only the model, picks nprobe cells
    * driver-side, and scans ONLY those `cell=` directories — partition
    * pruning visible in the scan (AnnIndexSpec pins the scanned file
    * list to the probed cells), with no training and no raw vectors in
    * the serving plan. Hyperparameters match `q_pq_ivf` exactly, so
    * the persisted probe must reproduce its ranking bit-for-bit
    * (spec-pinned) and the same oracle replay gates both.
    */
  def qAnnPersisted(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.orderBy(col("vec_id").asc).limit(1)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().head.getSeq[Double](0)
    val params = graft.sim.AnnIndex.Params(dims = 64, coarseK = 8,
      coarseIters = 3, m = 4, k = 4, pqIters = 2, nprobeDefault = 3)
    val path = graft.sim.AnnIndex.defaultPath(d)
    val (models, _) = graft.sim.AnnIndex.ensure(emb, "vec_id", "embedding",
      pqTrainSample(emb), params, path)
    graft.sim.AnnIndex.probe(s, path, models, q, nprobe = 3, n = 10)
  }

  val qPqIvfSql: String =
    s"""${kmeansCtes(8, 3, Some(pqTrainWhereSql))},
       |$pqChains,
       |$pqDTables,
       |qv AS (
       |  SELECT x, ${dotSql("x", "x")} AS qq
       |  FROM (SELECT list_transform(range(1, 65),
       |          i -> cast(embedding[i] as double)) AS x
       |        FROM embeddings
       |        WHERE vec_id = (SELECT min(vec_id) FROM embeddings))),
       |probe AS (
       |  SELECT c.cluster
       |  FROM cent3 c CROSS JOIN qv q
       |  ORDER BY q.qq - 2 * ${dotSql("q.x", "c.cv")} + ${dotSql("c.cv", "c.cv")} ASC,
       |    c.cluster ASC
       |  LIMIT 3),
       |cand AS (
       |  SELECT vec_id FROM asg4
       |  WHERE cluster IN (SELECT cluster FROM probe))
       |SELECT vec_id, code, round(greatest(adist, 0.0), 6) AS adist
       |FROM (
       |  SELECT a0.vec_id, $pqCodeExpr AS code, $pqAdistExpr AS adist
       |  FROM s0_asg3 a0 $pqJoins
       |  WHERE a0.vec_id IN (SELECT vec_id FROM cand)
       |  ORDER BY adist, vec_id LIMIT 10)""".stripMargin

  /** Residual IVF-ADC search — textbook IVF-PQ (Jégou et al., PAMI
    * 2011): the PQ codebooks are trained on coarse-cell residuals
    * r = x − q1(x) instead of raw vectors, and the ADC tables are
    * built per probed cell from the query's own cell residual. Same
    * coarse/PQ hyperparameters as `q_pq_ivf`, so the two rankings
    * differ only by the residual refinement. The oracle replays the
    * ENTIRE pipeline — coarse training, residual computation, all
    * four residual-subspace trainings, the per-cell distance tables,
    * and the rank boundary — bit-for-bit.
    */
  def qPqResidual(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.orderBy(col("vec_id").asc).limit(1)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().head.getSeq[Double](0)
    val coarse = graft.sim.KMeans.fit(pqTrainSample(emb), "vec_id",
      "embedding", k = 8, iters = 3)
    val model = graft.sim.ProductQuantizer.fitResidual(pqTrainSample(emb),
      "vec_id", "embedding", coarse, dims = 64, m = 4, k = 4, iters = 2)
    graft.sim.ProductQuantizer.ivfAdcResidualTopK(emb, "vec_id", "embedding",
      coarse, model, q, nprobe = 3, n = 10)
  }

  val qPqResidualSql: String = {
    // residual-trained subspace chains, sourced from the `res` CTE
    val rChains = (0 until 4)
      .map(j => pqSubspaceCtes(s"r${j}_", j * 16 + 1, 16, 4, 2,
        src = "res", vec = "rx", trainWhere = Some(pqTrainWhereSql)))
      .mkString(",\n")
    // per-probed-cell ADC tables: query's cell residual vs every
    // residual-codebook centroid
    val rTables = (0 until 4).map { j =>
      s"""rd$j AS (
         |  SELECT s.cell, c.cluster,
         |    ${dotSql("s.x", "s.x")} - 2 * ${dotSql("s.x", "c.cv")} + ${dotSql("c.cv", "c.cv")} AS dval
         |  FROM r${j}_cent2 c CROSS JOIN (
         |    SELECT cell, list_transform(range(${j * 16 + 1}, ${j * 16 + 17}),
         |      i -> rx[i]) AS x
         |    FROM qres) s)""".stripMargin
    }.mkString(",\n")
    val code = (0 until 4).map(j => s"cast(a$j.cluster as varchar)")
      .mkString(" || '-' || ")
    val adist = (0 until 4).map(j => s"rd$j.dval").mkString(" + ")
    val joins = (1 until 4).map(j => s"JOIN r${j}_asg3 a$j USING (vec_id)")
      .mkString(" ") + " JOIN res ON a0.vec_id = res.vec_id " +
      (0 until 4).map(j =>
        s"JOIN rd$j ON res.cell = rd$j.cell AND a$j.cluster = rd$j.cluster")
        .mkString(" ")
    s"""${kmeansCtes(8, 3, Some(pqTrainWhereSql))},
       |res AS (
       |  SELECT a.vec_id,
       |    list_transform(range(1, 65), i -> cast(a.x[i] as double) - c.cv[i]) AS rx,
       |    a.cluster AS cell
       |  FROM asg4 a JOIN cent3 c USING (cluster)),
       |$rChains,
       |qv AS (
       |  SELECT x, ${dotSql("x", "x")} AS qq
       |  FROM (SELECT list_transform(range(1, 65),
       |          i -> cast(embedding[i] as double)) AS x
       |        FROM embeddings
       |        WHERE vec_id = (SELECT min(vec_id) FROM embeddings))),
       |probe AS (
       |  SELECT c.cluster
       |  FROM cent3 c CROSS JOIN qv q
       |  ORDER BY q.qq - 2 * ${dotSql("q.x", "c.cv")} + ${dotSql("c.cv", "c.cv")} ASC,
       |    c.cluster ASC
       |  LIMIT 3),
       |qres AS (
       |  SELECT c.cluster AS cell,
       |    list_transform(range(1, 65), i -> q.x[i] - c.cv[i]) AS rx
       |  FROM cent3 c CROSS JOIN qv q
       |  WHERE c.cluster IN (SELECT cluster FROM probe)),
       |$rTables
       |SELECT vec_id, code, round(greatest(adist, 0.0), 6) AS adist
       |FROM (
       |  SELECT a0.vec_id, $code AS code, $adist AS adist
       |  FROM r0_asg3 a0 $joins
       |  WHERE res.cell IN (SELECT cluster FROM probe)
       |  ORDER BY adist, vec_id LIMIT 10)""".stripMargin
  }

  /** Shared DuckDB staging for the SQ8 queries: casted vectors, the
    * per-vector scale (zero-vector guarded), and the half-up-rounded
    * int8 component list — the exact arithmetic of
    * [[graft.sim.ScalarQuantizer]].
    */
  private val sq8StageSql: String =
    s"""b AS (SELECT vec_id, list_transform(range(1, 65),
       |        i -> cast(embedding[i] as double)) AS x
       |      FROM embeddings),
       |e AS (SELECT vec_id, x,
       |        list_max(list_transform(x, v -> abs(v))) AS ma FROM b),
       |sc AS (SELECT vec_id, x,
       |         CASE WHEN ma = 0 THEN 1.0 ELSE ma / 127.0 END AS scale FROM e),
       |qz AS (SELECT vec_id, x, scale,
       |         list_transform(x, v -> cast(floor(v / scale + 0.5) as int)) AS qv
       |       FROM sc)""".stripMargin

  /** Int8 scalar quantization of every embedding (per-vector symmetric
    * scale, the FAISS-SQ8 shape): (vec_id, scale, code, err). One
    * narrow projection in Spark; the oracle replays scale, half-up
    * rounding, and the reconstruction error bit-for-bit.
    */
  def qSq8Encode(s: SparkSession, d: String): DataFrame =
    graft.sim.ScalarQuantizer.encode(Tables.embeddings(s, d),
      "vec_id", "embedding")

  val qSq8EncodeSql: String =
    s"""WITH $sq8StageSql,
       |d AS (SELECT vec_id, scale, qv,
       |        list_transform(range(1, 65), i -> x[i] - qv[i] * scale) AS diff
       |      FROM qz)
       |SELECT vec_id, scale,
       |  array_to_string(qv, ',') AS code,
       |  round(greatest(${dotSql("diff", "diff")}, 0.0), 6) AS err
       |FROM d""".stripMargin

  /** SQ8 re-rank search: top-10 by squared-L2 between the DEQUANTIZED
    * corpus vectors and the lowest-id query embedding — the precise
    * second stage a PQ candidate sweep hands off to. Encode + distance
    * fuse into one narrow pass; the rank boundary is hash-pinned in
    * the oracle.
    */
  def qSq8TopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.orderBy(col("vec_id").asc).limit(1)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().head.getSeq[Double](0)
    graft.sim.ScalarQuantizer.topK(emb, "vec_id", "embedding", q, n = 10)
  }

  val qSq8TopKSql: String =
    s"""WITH $sq8StageSql,
       |qv0 AS (SELECT list_transform(range(1, 65),
       |          i -> cast(embedding[i] as double)) AS qx
       |        FROM embeddings
       |        WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
       |d AS (SELECT vec_id,
       |        list_transform(range(1, 65), i -> qv[i] * scale - qx[i]) AS diff
       |      FROM qz CROSS JOIN qv0)
       |SELECT vec_id, round(greatest(dist, 0.0), 6) AS dist
       |FROM (
       |  SELECT vec_id, ${dotSql("diff", "diff")} AS dist
       |  FROM d
       |  ORDER BY dist, vec_id LIMIT 10)""".stripMargin

  /** MMR diverse top-10 (λ=0.7, pool=32) against the lowest-id query
    * embedding. The oracle replays the WHOLE selection in a recursive
    * CTE — relevance pass, pool boundary, pairwise sims, and all ten
    * greedy picks with their scores — so the diversity trade-off
    * itself is hash-pinned, not just the final id set. λ and 1−λ are
    * interpolated from the same Scala doubles the driver greedy uses,
    * keeping float literals bit-identical across engines.
    */
  def qMmr(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.orderBy(col("vec_id").asc).limit(1)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().head.getSeq[Double](0)
    graft.sim.Mmr.selectDiverse(emb, "vec_id", "embedding", q,
      k = 10, poolSize = 32, lambda = MmrLambda)
  }

  private val MmrLambda = 0.7

  val qMmrSql: String = {
    val lam = MmrLambda.toString
    val oneMinus = (1 - MmrLambda).toString
    s"""WITH RECURSIVE b AS (
       |  SELECT vec_id, list_transform(range(1, 65),
       |    i -> cast(embedding[i] as double)) AS x
       |  FROM embeddings),
       |n AS (SELECT vec_id, x, sqrt(${dotSql("x", "x")}) AS nrm FROM b),
       |qv AS (SELECT x AS qx, sqrt(${dotSql("x", "x")}) AS qn
       |       FROM b WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
       |r AS (SELECT vec_id, x, nrm,
       |        CASE WHEN nrm * qn > 0 THEN ${dotSql("x", "qx")} / (nrm * qn)
       |             ELSE 0.0 END AS rel
       |      FROM n CROSS JOIN qv),
       |pool AS (SELECT * FROM r ORDER BY rel DESC, vec_id LIMIT 32),
       |sims AS (SELECT a.vec_id AS ai, b.vec_id AS bi,
       |           CASE WHEN a.nrm * b.nrm > 0
       |                THEN ${dotSql("a.x", "b.x")} / (a.nrm * b.nrm)
       |                ELSE 0.0 END AS sim
       |         FROM pool a JOIN pool b ON a.vec_id != b.vec_id),
       |sel AS (
       |  (SELECT 1 AS step, [p.vec_id] AS ids, p.vec_id AS picked,
       |          $lam * p.rel AS score
       |   FROM pool p ORDER BY p.rel DESC, p.vec_id LIMIT 1)
       |  UNION ALL
       |  SELECT sel.step + 1, list_append(sel.ids, w.vec_id), w.vec_id, w.sc
       |  FROM sel, LATERAL (
       |    SELECT c.vec_id,
       |      $lam * c.rel - $oneMinus * coalesce((SELECT max(s.sim) FROM sims s
       |        WHERE s.ai = c.vec_id AND list_contains(sel.ids, s.bi)), 0.0) AS sc
       |    FROM pool c
       |    WHERE NOT list_contains(sel.ids, c.vec_id)
       |    ORDER BY sc DESC, c.vec_id
       |    LIMIT 1) w
       |  WHERE sel.step < 10)
       |SELECT cast(step as bigint) AS sel_rank, picked AS vec_id,
       |  round(score, 6) AS score
       |FROM sel""".stripMargin
  }

  /** The composed two-tier ANN stack — coarse IVF cell pruning, a
    * PQ-ADC candidate sweep (top-50 by compressed distance), then an
    * SQ8 dequantized re-rank of the survivors (top-10) — the retrieval
    * architecture every production vector index converges on: cheap
    * codes shrink the candidate set, precise codes order what's left.
    * Training reuses the 1-in-4 sample; every stage boundary (cell
    * probe, candidate rank cut, re-rank order) replays exactly in the
    * oracle.
    */
  def qAnnRerank(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val q = emb.orderBy(col("vec_id").asc).limit(1)
      .select(col("embedding").cast(ArrayType(DoubleType)))
      .collect().head.getSeq[Double](0)
    val coarse = graft.sim.KMeans.fit(pqTrainSample(emb), "vec_id",
      "embedding", k = 8, iters = 3)
    val model = graft.sim.ProductQuantizer.fit(pqTrainSample(emb),
      "vec_id", "embedding", dims = 64, m = 4, k = 4, iters = 2)
    val cands = graft.sim.ProductQuantizer.ivfAdcTopK(emb, "vec_id",
      "embedding", coarse, model, q, nprobe = 3, n = 50)
      .select(col("vec_id"))
    graft.sim.ScalarQuantizer.topK(emb.join(cands, Seq("vec_id")),
      "vec_id", "embedding", q, n = 10)
  }

  val qAnnRerankSql: String =
    s"""${kmeansCtes(8, 3, Some(pqTrainWhereSql))},
       |$pqChains,
       |$pqDTables,
       |qv AS (
       |  SELECT x, ${dotSql("x", "x")} AS qq
       |  FROM (SELECT list_transform(range(1, 65),
       |          i -> cast(embedding[i] as double)) AS x
       |        FROM embeddings
       |        WHERE vec_id = (SELECT min(vec_id) FROM embeddings))),
       |probe AS (
       |  SELECT c.cluster
       |  FROM cent3 c CROSS JOIN qv q
       |  ORDER BY q.qq - 2 * ${dotSql("q.x", "c.cv")} + ${dotSql("c.cv", "c.cv")} ASC,
       |    c.cluster ASC
       |  LIMIT 3),
       |cand AS (
       |  SELECT vec_id FROM asg4
       |  WHERE cluster IN (SELECT cluster FROM probe)),
       |c50 AS (
       |  SELECT vec_id FROM (
       |    SELECT a0.vec_id, $pqAdistExpr AS adist
       |    FROM s0_asg3 a0 $pqJoins
       |    WHERE a0.vec_id IN (SELECT vec_id FROM cand)
       |    ORDER BY adist, a0.vec_id LIMIT 50)),
       |sb AS (SELECT vec_id, list_transform(range(1, 65),
       |         i -> cast(embedding[i] as double)) AS x
       |       FROM embeddings WHERE vec_id IN (SELECT vec_id FROM c50)),
       |se AS (SELECT vec_id, x,
       |         list_max(list_transform(x, v -> abs(v))) AS ma FROM sb),
       |ssc AS (SELECT vec_id, x,
       |          CASE WHEN ma = 0 THEN 1.0 ELSE ma / 127.0 END AS scale FROM se),
       |sqz AS (SELECT vec_id, x, scale,
       |          list_transform(x, v -> cast(floor(v / scale + 0.5) as int)) AS qv
       |        FROM ssc),
       |sd AS (SELECT vec_id,
       |         list_transform(range(1, 65), i -> qv[i] * scale - qx.x[i]) AS diff
       |       FROM sqz CROSS JOIN qv qx)
       |SELECT vec_id, round(greatest(dist, 0.0), 6) AS dist
       |FROM (
       |  SELECT vec_id, ${dotSql("diff", "diff")} AS dist
       |  FROM sd
       |  ORDER BY dist, vec_id LIMIT 10)""".stripMargin

  /** SemDeDup (cluster-then-pairwise semantic dedup): deterministic
    * k-means, then within each cluster drop every vector with a
    * lower-id neighbor at cosine ≥ τ. The full pipeline — three Lloyd
    * rounds AND the within-cluster prune — replays exactly in DuckDB
    * off the shared unrolled-Lloyd prologue.
    */
  def qSemdedup(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    // The paper's occupancy rule (SemDedup.scala scaladoc): size k so
    // expected cluster occupancy stays ~CONSTANT (k ≈ N/occupancy),
    // which keeps the within-cluster pairwise stage O(N·occupancy) —
    // linear in the corpus — instead of O(N²/k) at a pinned k. The
    // occupancy knob is 64 here so the synthetic corpus actually
    // exercises k growth at bench scale (sf0.1: N=2000 → k=32,
    // measured pairs stay ~linear; see SCALE.md round 9) rather than
    // riding the floor. The count is one metadata-cheap action
    // (bounded model state, like the centroids the fit collects). At
    // the correctness gate's sf0.01 (N=500 → ceil(500/64)=8) the
    // derived k is exactly the oracle's unrolled k=8, so the static
    // SQL below stays bit-for-bit right.
    val k = math.max(8, math.ceil(emb.count() / 64.0).toInt)
    graft.sim.SemDedup.semDedup(emb, "vec_id", "embedding",
      k = k, iters = 3, tau = SemDedupTau)
  }

  private val SemDedupTau = 0.3

  /** DuckDB left-fold dot product matching `graft.functions.DotFold`
    * bit-for-bit — the shared fragment for every cosine oracle.
    */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(cast(0 as double),
       |  list_transform(range(1, len($a) + 1),
       |    i -> cast($a[i] as double) * cast($b[i] as double))),
       |  (acc, v) -> acc + v)""".stripMargin

  /** DuckDB cosine over [[dotSql]], zero for zero-norm vectors —
    * operation order matches `Ann.cosinePre` exactly.
    */
  private def cosSql(a: String, b: String): String =
    s"""CASE WHEN sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}) > 0
       |  THEN ${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))
       |  ELSE 0.0 END""".stripMargin

  /** The JL-projection CTE `pr` (vec_id, pvec): hyperplanes recomputed
    * from their integer formula, mirroring `Ann.project(_, outDim)` at
    * seed offset `so`. Shared by the projected-ANN and RRF oracles.
    */
  private def jlProjCte(outDim: Int, so: Int): String = {
    val s = math.sqrt(outDim.toDouble)
    s"""pr AS (
       |  SELECT vec_id, list_transform(range(0, $outDim), j ->
       |    list_reduce(list_prepend(cast(0 as double),
       |      list_transform(range(1, 65), i ->
       |        cast(embedding[i] as double) *
       |        (((($so + j) * 2654435761 + (i - 1) * 40503 + 17) % 1009)
       |          / 1009.0 * 2.0 - 1.0))),
       |      (acc, v) -> acc + v) / $s) AS pvec
       |  FROM embeddings)""".stripMargin
  }

  val qSemdedupSql: String = {
    def cos(a: String, b: String) = cosSql(a, b)
    // k derives from the corpus count IN SQL — the same
    // max(8, ceil(N/64)) occupancy rule qSemdedup applies — so this
    // oracle is exact at EVERY scale factor (sf0.1's k=32 included),
    // not just where the derived k happens to equal a baked-in 8
    val kSql = "(SELECT greatest(8, cast(ceil(count(*) / 64.0) as bigint)) " +
      "FROM embeddings)"
    s"""${kmeansCtes(8, 3, None, Some(kSql))},
       |sd_pairs AS (
       |  SELECT b2.vec_id, round(${cos("a.x", "b2.x")}, 6) AS cs
       |  FROM asg4 a JOIN asg4 b2
       |    ON a.cluster = b2.cluster AND a.vec_id < b2.vec_id),
       |sd_drop AS (
       |  SELECT vec_id, max(cs) AS max_dup_sim FROM sd_pairs
       |  WHERE cs >= $SemDedupTau GROUP BY vec_id)
       |SELECT k.vec_id, k.cluster, (d.vec_id IS NULL) AS kept, d.max_dup_sim
       |FROM asg4 k LEFT JOIN sd_drop d ON k.vec_id = d.vec_id""".stripMargin
  }

  /** Triangle participation counts over the co-purchase graph (parts
    * appearing in the same order) — the local clustering-density
    * signal complementing components (membership) and PageRank
    * (centrality). Spark runs degree-ordered compact-forward (each
    * triangle found once at its lowest-ordered vertex, wedge fan-out
    * bounded O(m^1.5)); the oracle brute-forces the same triangles
    * with a three-way self-join, so the counts pin the orientation
    * logic exactly.
    */
  def qTriangles(s: SparkSession, d: String): DataFrame = {
    // demo graph bounded to 1/4 of orders: the co-purchase graph's
    // wedge count grows ~quadratically in per-part order frequency
    // (Σ outdeg² ≈ 50M at sf0.1 unbounded — 20s of pure wedge fan-out
    // in EITHER engine); the filter keeps the bench query
    // representative while exercising the identical operator
    val l = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 4 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val edges = l.alias("a").join(l.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
    graft.ops.Triangles.perNode(edges)
      .select(col("id").as("part"), col("n_tri"))
  }

  val qTrianglesSql: String =
    """WITH li AS (
      |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 4 = 0),
      |e AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM li a JOIN li b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |t AS (
      |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
      |  FROM e e1 JOIN e e2 ON e1.v = e2.u
      |    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      |n AS (SELECT x AS id FROM t UNION ALL
      |      SELECT y FROM t UNION ALL SELECT z FROM t)
      |SELECT id AS part, count(*) AS n_tri FROM n GROUP BY 1""".stripMargin

  /** Fuzzy self-join of part names within Levenshtein distance 2 via
    * deletion-neighborhood blocking (FastSS/SymSpell) — candidates
    * from an equi-join on shared ≤2-deletion variants, verified by
    * exact edit distance. The oracle brute-forces the all-pairs
    * distance, so any candidate the blocking missed would surface as
    * a row-count mismatch — the completeness property under test.
    */
  def qFuzzyJoin(s: SparkSession, d: String): DataFrame =
    graft.ops.FuzzyJoin.selfJoin(Tables.part(s, d), "p_name", maxEdits = 2)

  val qFuzzyJoinSql: String =
    """WITH p AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)
      |SELECT a.p_name AS str_a, b.p_name AS str_b,
      |  cast(levenshtein(a.p_name, b.p_name) as bigint) AS dist
      |FROM p a JOIN p b ON a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin

  /** Corpus snapshot diff: a synthetic "previous crawl" is derived
    * deterministically from the current documents table (10%-sampled
    * deletions → `added`, planted text edits → `changed`, ghost rows
    * → `removed`), then every key is classified by content
    * fingerprint. The incremental-ingest audit — its `added|changed`
    * output is exactly the frame `Dedup.dropDuplicatesAgainst`
    * expects as the incoming side. The oracle replays the same
    * derivation and a FULL OUTER text compare, so the fingerprint
    * classification is hash-pinned end to end.
    */
  def qSnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val cur = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val old = cur.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" [stale]")))
          .otherwise(col("text")).as("text"))
      // ghost ids live OUTSIDE the doc_id domain (negative), so they
      // can never collide with a real key at any corpus size — a
      // collision would violate SnapshotDiff's unique-key-per-side
      // precondition and fan the full outer join out many-to-many
      .unionByName(cur.filter(col("doc_id") % 13 === 0)
        .select((-col("doc_id") - 1L).as("doc_id"),
          concat(lit("ghost "), col("doc_id").cast(StringType)).as("text")))
    graft.ops.SnapshotDiff.diff(old, cur, Seq("doc_id"), md5(col("text")))
  }

  val qSnapshotDiffSql: String =
    """WITH cur AS (SELECT doc_id, text FROM documents),
      |old AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 7 = 0 THEN text || ' [stale]' ELSE text END
      |      AS text
      |  FROM cur WHERE doc_id % 10 <> 0
      |  UNION ALL
      |  SELECT -doc_id - 1, 'ghost ' || cast(doc_id as varchar)
      |  FROM cur WHERE doc_id % 13 = 0)
      |SELECT coalesce(o.doc_id, c.doc_id) AS doc_id,
      |  CASE WHEN o.doc_id IS NULL THEN 'added'
      |       WHEN c.doc_id IS NULL THEN 'removed'
      |       WHEN o.text = c.text THEN 'unchanged'
      |       ELSE 'changed' END AS status
      |FROM old o FULL OUTER JOIN cur c ON o.doc_id = c.doc_id""".stripMargin

  /** Salted skew join, correctness-gated: lineitem (big, salted 8
    * ways by the order key) joined to supplier (small, replicated) —
    * see [[graft.ops.SkewJoin.saltedJoin]] — then revenue per
    * supplier in exact integer cents. The oracle runs the PLAIN join:
    * passing the gate proves salting is a pure dataflow rewrite (the
    * operator previously had only a spec; this pins it cross-engine).
    */
  def qSaltedJoin(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_suppkey"), col("l_orderkey"),
      round(col("l_extendedprice") * 100).cast(LongType).as("cents"))
    val supp = Tables.supplier(s, d)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    graft.ops.SkewJoin.saltedJoin(li, supp, Seq("l_suppkey"),
      saltBy = col("l_orderkey"), salts = 8)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("revenue_cents"))
  }

  val qSaltedJoinSql: String =
    """SELECT s_name, count(*) AS n_items,
      |  cast(sum(cast(round(l_extendedprice * 100) as bigint)) as bigint)
      |    AS revenue_cents
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY 1""".stripMargin

  /** Bounded per-group top-k WITHOUT a window: top-3 orders by price
    * within each order priority via the [[graft.functions.TopKAgg]]
    * native aggregate — O(k) state per group, map-side partials, no
    * per-group sort of the full table (the `row_number() <= k` window
    * this replaces moves every row of a group through one reducer;
    * the aggregate moves at most k per partition). Prices quantized
    * to integer cents so cross-engine ordering is exact; the oracle
    * replays the same total order as a window, pinning rank
    * boundaries and tie-breaks.
    */
  def qTopkGroup(s: SparkSession, d: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast(LongType)
    Tables.orders(s, d)
      .select(col("o_orderpriority"), cents.as("cents"), col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.TopKAgg.top_k_by(col("cents"), col("o_orderkey"), 3)
        .as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("o_orderpriority"), (col("p") + 1).cast(LongType).as("rnk"),
        col("t.ord").as("price_cents"), col("t.payload").as("o_orderkey"))
  }

  val qTopkGroupSql: String =
    """WITH o AS (
      |  SELECT o_orderpriority,
      |    cast(round(o_totalprice * 100) as bigint) AS cents, o_orderkey
      |  FROM orders),
      |r AS (
      |  SELECT o_orderpriority, cents, o_orderkey,
      |    row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY cents DESC, o_orderkey ASC) AS rnk
      |  FROM o)
      |SELECT o_orderpriority, cast(rnk as bigint) AS rnk,
      |  cents AS price_cents, o_orderkey
      |FROM r WHERE rnk <= 3""".stripMargin

  /** Corpus drift monitor: per-source total-variation distance of the
    * quality-score distribution between an "old" snapshot and a "new"
    * one over a 16-bin histogram — see
    * [[graft.ops.Drift.histogramDrift]]. The demo snapshots split the
    * corpus by the HASH coordinate (not id parity: the synthetic
    * source column is a function of doc_id mod, so parity would hand
    * each snapshot a disjoint source set and the both-sides join an
    * empty result). The oracle replays the split, the binning, both
    * histograms, and the decimal-summed TV exactly.
    */
  def qDrift(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.documents(s, d).select(col("doc_id"), col("source"),
      TextAnalysis.qualityScore(col("text")).as("q"))
    val u = graft.ops.Sampling.coordinate(col("doc_id"))
    graft.ops.Drift.histogramDrift(
      scored.filter(u < 0.5),
      scored.filter(u >= 0.5),
      "source", "q", lo = 0.0, hi = 1.0, bins = 16)
  }

  val qDriftSql: String = {
    val u = graft.ops.Sampling.coordinateSql("doc_id")
    def hist(cond: String, cName: String) =
      s"""SELECT source,
         |  least(greatest(cast(floor((q - 0.0) / 0.0625) as int), 0), 15) AS bin,
         |  count(*) AS $cName
         |FROM sc WHERE $cond AND q IS NOT NULL GROUP BY 1, 2"""
        .stripMargin
    s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
       |sc AS (SELECT doc_id, source,
       |         ${qualityExprSql("toks", "text")} AS q FROM t),
       |ho AS (${hist(s"$u < 0.5", "c_old")}),
       |hn AS (${hist(s"$u >= 0.5", "c_new")}),
       |no AS (SELECT source, cast(sum(c_old) as bigint) AS n_old FROM ho GROUP BY 1),
       |nn AS (SELECT source, cast(sum(c_new) as bigint) AS n_new FROM hn GROUP BY 1),
       |j AS (
       |  -- explicit coalesce of the join keys: a bare `source` after
       |  -- FULL OUTER ... USING binds to the LEFT side (NULL on
       |  -- right-only rows) and silently drops them at the next join
       |  SELECT coalesce(o.source, n.source) AS source,
       |    coalesce(o.bin, n.bin) AS bin,
       |    coalesce(o.c_old, 0) AS c_old, coalesce(n.c_new, 0) AS c_new
       |  FROM ho o FULL OUTER JOIN hn n
       |    ON o.source = n.source AND o.bin = n.bin),
       |terms AS (
       |  SELECT source, n_old, n_new,
       |    cast(round(abs(cast(c_old as double) / cast(n_old as double) -
       |      cast(c_new as double) / cast(n_new as double)), 9)
       |      as decimal(20,9)) AS term
       |  FROM j JOIN no USING (source) JOIN nn USING (source))
       |SELECT source, n_old, n_new,
       |  round(cast(sum(term) as double) / 2.0, 6) AS tv
       |FROM terms GROUP BY 1, 2, 3""".stripMargin
  }

  /** PageRank centrality over the customer↔supplier purchase graph
    * (both directions of every distinct trading pair): the
    * graph-centrality weight of a curation pipeline, with the FULL
    * five-iteration damped power method replayed exactly in SQL thanks
    * to the quantized-integer rank units.
    */
  def qPagerank(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    // namespace the bipartite ids into one long space: cust → 2k, supp → 2k+1.
    // PERSISTED: the join+distinct is the query's most expensive stage
    // and is otherwise re-evaluated by both union branches times both
    // downstream materializations (edge cache + vertex cache)
    val ed = graft.CacheRegistry.register(
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val edges = ed.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(ed.select(col("b").as("src"), col("a").as("dst")))
    val nodes = edges.select(col("src").as("id")).distinct()
    graft.ops.PageRank.run(nodes, edges, damping = 0.85, iters = 5)
      .select(
        when(col("id") % 2 === 0, "cust").otherwise("supp").as("kind"),
        expr("id div 2").as("node_key"),
        col("rank"))
  }

  val qPagerankSql: String = {
    val sc = graft.ops.PageRank.Scale
    val d = 0.85
    val base = Math.round((1.0 - d) * sc)
    def iter(n: Int) =
      s"""r$n AS (
         |  SELECT n.id,
         |    cast($base + cast(round($d * cast(coalesce(s.s, 0) as double)) as bigint)
         |         as bigint) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst, sum(r.r // e.outdeg) AS s
         |    FROM e JOIN r${n - 1} r ON e.src = r.id GROUP BY e.dst) s
         |    ON n.id = s.dst)""".stripMargin
    s"""WITH ed AS (
       |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |edges AS (SELECT a AS src, b AS dst FROM ed
       |          UNION ALL SELECT b AS src, a AS dst FROM ed),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |e AS (SELECT edges.src, edges.dst, deg.outdeg
       |      FROM edges JOIN deg USING (src)),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |r0 AS (SELECT id, cast($sc as bigint) AS r FROM nodes),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT CASE WHEN id % 2 = 0 THEN 'cust' ELSE 'supp' END AS kind,
       |  id // 2 AS node_key,
       |  round(cast(r as double) / $sc, 6) AS rank
       |FROM r5""".stripMargin
  }

  /** The cust–supp bipartite interaction graph shared by the LPA and
    * k-core queries (same construction as `qPagerank`): customer and
    * supplier keys namespaced into one id space (cust → 2k,
    * supp → 2k+1), symmetrized, deduplicated. The join+distinct is the
    * expensive stage and feeds every downstream consumer, so it is
    * persisted via the CacheRegistry.
    */
  private def bipartiteEdges(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    val ed = graft.CacheRegistry.register(
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    ed.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(ed.select(col("b").as("src"), col("a").as("dst")))
  }

  private val bipartiteEdgesSql: String =
    """ed AS (
      |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |edges AS (SELECT a AS src, b AS dst FROM ed
      |          UNION ALL SELECT b AS src, a AS dst FROM ed),
      |nodes AS (SELECT DISTINCT src AS id FROM edges)""".stripMargin

  /** The co-purchase part graph shared by the LPA and modularity
    * queries (same construction as `qTriangles`, same 1/4-of-orders
    * bound): parts sharing an order, symmetrized, multi-edges KEPT —
    * multiplicity is the co-purchase weight, so votes and modularity
    * are frequency-weighted. Chosen over the bipartite cust–supp
    * graph deliberately: synchronous LPA's fixpoint on a bipartite
    * graph is the 2-coloring (each side's neighbor majority is the
    * other side — a degenerate, if deterministic, answer), while the
    * unipartite projection carries actual clustering.
    */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 4 === 0)
      .select(col("l_orderkey"), col("l_partkey"))
    val pairs = graft.CacheRegistry.register(
      li.alias("a").join(li.alias("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("s"), col("b.l_partkey").as("t"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    pairs.select(col("s").as("src"), col("t").as("dst"))
      .unionAll(pairs.select(col("t").as("src"), col("s").as("dst")))
  }

  private val coPurchaseEdgesSql: String =
    """li AS (SELECT l_orderkey, l_partkey FROM lineitem
      |       WHERE l_orderkey % 4 = 0),
      |pairs AS (
      |  SELECT a.l_partkey AS s, b.l_partkey AS t FROM li a
      |  JOIN li b ON a.l_orderkey = b.l_orderkey
      |    AND a.l_partkey < b.l_partkey),
      |edges AS (SELECT s AS src, t AS dst FROM pairs
      |          UNION ALL SELECT t, s FROM pairs),
      |nodes AS (SELECT DISTINCT src AS id FROM edges)""".stripMargin

  /** Synchronous label-propagation communities on the co-purchase
    * part graph: 4 fixed voting rounds, self vote included, ties to
    * the smallest label (graft.ops.LabelPropagation — all-integer
    * votes, so the oracle's unrolled rounds replay exactly). Output:
    * every part with its community label and community size — the
    * per-community grouping key a curation pipeline caps/samples on,
    * analogous to the eTLD+1 domain key but structure-derived
    * (sf0.01: 83 communities, largest 230, modularity +0.17).
    */
  def qLabelProp(s: SparkSession, d: String): DataFrame = {
    val edges = coPurchaseEdges(s, d)
    val nodes = edges.select(col("src").as("id")).distinct()
    graft.ops.LabelPropagation.withSizes(nodes, edges, rounds = 4)
      .select(col("id").as("part"), col("community"), col("csize"))
  }

  /** Unrolled synchronous-LPA rounds (CTEs `l0`..`l<rounds>` over the
    * prepended `edges`/`nodes`) shared by the LPA and modularity
    * oracles. */
  private def lpaRoundsSql(rounds: Int): String = {
    def round(n: Int) =
      s"""c$n AS (
         |  SELECT vid, lbl, count(*) AS c FROM (
         |    SELECT id AS vid, lbl FROM l${n - 1}
         |    UNION ALL
         |    SELECT e.dst AS vid, p.lbl FROM edges e
         |    JOIN l${n - 1} p ON e.src = p.id)
         |  GROUP BY 1, 2),
         |p$n AS (
         |  SELECT vid, lbl, row_number() OVER (PARTITION BY vid
         |    ORDER BY c DESC, lbl ASC) AS rn
         |  FROM c$n),
         |l$n AS (SELECT vid AS id, lbl FROM p$n WHERE rn = 1)""".stripMargin
    s"""l0 AS (SELECT id, id AS lbl FROM nodes),
       |${(1 to rounds).map(round).mkString(",\n")}""".stripMargin
  }

  val qLabelPropSql: String = {
    s"""WITH $coPurchaseEdgesSql,
       |${lpaRoundsSql(4)},
       |sz AS (SELECT lbl, count(*) AS csize FROM l4 GROUP BY 1)
       |SELECT l4.id AS part, l4.lbl AS community, sz.csize
       |FROM l4 JOIN sz ON l4.lbl = sz.lbl""".stripMargin
  }

  /** Newman modularity of the LPA communities — the quality metric
    * that closes the community-detection loop: Q_c = L_c/m −
    * (d_c/2m)², computed from the DIRECTED symmetric edge list as
    * Q_c = (intra2·E − deg²)/E² with E = directed edge count, all
    * integer until one final double division+round (the PageRank
    * quantization discipline — cross-engine exact). One extra
    * aggregation pass over the labeled edges computes intra-edge and
    * degree sums together. Emits per-community contributions plus the
    * corpus total.
    */
  def qModularity(s: SparkSession, d: String): DataFrame = {
    val edges = coPurchaseEdges(s, d)
    val nodes = edges.select(col("src").as("id")).distinct()
    val labels = graft.ops.LabelPropagation.run(nodes, edges, rounds = 4)
    val le = edges
      .join(labels.select(col("id"), col("community").as("csrc")),
        edges("src") === col("id")).drop("id")
      .join(labels.select(col("id").as("did"), col("community").as("cdst")),
        col("dst") === col("did")).drop("did")
    val c = le.groupBy(col("csrc").as("community"))
      .agg(count(lit(1)).as("deg_sum"),
        sum(when(col("csrc") === col("cdst"), 1L).otherwise(0L)).as("intra2"))
    val ed = edges.agg(count(lit(1)).as("e_d"))
    val c2 = c.crossJoin(broadcast(ed))
      .withColumn("q_num",
        col("intra2") * col("e_d") - col("deg_sum") * col("deg_sum"))
    val tot = c2.agg(sum(col("q_num")).as("sum_num"),
      max(col("e_d")).as("e_max"))
      .select((round(col("sum_num").cast("double") /
        (col("e_max").cast("double") * col("e_max").cast("double")), 6)
        + lit(0.0)).as("q_total")) // + 0.0 folds IEEE -0.0 to +0.0
    c2.select(col("community"), col("intra2"), col("deg_sum"),
        (round(col("q_num").cast("double") /
          (col("e_d").cast("double") * col("e_d").cast("double")), 6)
          + lit(0.0)).as("q_contrib")) // -0.0 → +0.0, mirrored in the oracle
      .crossJoin(broadcast(tot))
  }

  val qModularitySql: String =
    s"""WITH $coPurchaseEdgesSql,
       |${lpaRoundsSql(4)},
       |le AS (
       |  SELECT e.src, e.dst, a.lbl AS csrc, b.lbl AS cdst
       |  FROM edges e JOIN l4 a ON e.src = a.id JOIN l4 b ON e.dst = b.id),
       |ecnt AS (SELECT count(*) AS e_d FROM edges),
       |mc AS (
       |  SELECT csrc AS community, count(*) AS deg_sum,
       |    cast(sum(CASE WHEN csrc = cdst THEN 1 ELSE 0 END) as bigint) AS intra2
       |  FROM le GROUP BY 1),
       |mc2 AS (
       |  SELECT mc.*, ecnt.e_d,
       |    cast(intra2 * e_d - deg_sum * deg_sum as bigint) AS q_num
       |  FROM mc CROSS JOIN ecnt),
       |tot AS (
       |  SELECT round(cast(sum(q_num) as double) /
       |    (cast(max(e_d) as double) * cast(max(e_d) as double)), 6) + 0.0 AS q_total
       |  FROM mc2)
       |SELECT community, intra2, deg_sum,
       |  round(cast(q_num as double) /
       |    (cast(e_d as double) * cast(e_d as double)), 6) + 0.0 AS q_contrib,
       |  tot.q_total
       |FROM mc2 CROSS JOIN tot""".stripMargin

  /** Multi-source BFS hop distance (graft.ops.Bfs, 4 synchronous
    * relaxation rounds) from the seed set {parts ≡ 0 mod 101} on the
    * co-purchase graph: the link-distance quality prior — "how many
    * hops from a trusted seed is this item" — plus bounded-radius
    * neighborhood extraction. Unit weights + fixed rounds ⇒ round-r
    * distance IS the shortest path for everything reached, and the
    * all-integer min-relaxation unrolls exactly in the oracle.
    */
  def qSssp(s: SparkSession, d: String): DataFrame = {
    val edges = coPurchaseEdges(s, d)
    val nodes = edges.select(col("src").as("id")).distinct()
    val seeds = nodes.filter(col("id") % 101 === 0)
    graft.ops.Bfs.run(seeds, edges, rounds = 4)
      .select(col("id").as("part"), col("dist"))
  }

  val qSsspSql: String = {
    def relax(n: Int) =
      s"""r$n AS (
         |  SELECT id, min(dist) AS dist FROM (
         |    SELECT id, dist FROM r${n - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, r${n - 1}.dist + 1 AS dist
         |    FROM edges e JOIN r${n - 1} ON e.src = r${n - 1}.id)
         |  GROUP BY 1)""".stripMargin
    s"""WITH $coPurchaseEdgesSql,
       |r0 AS (SELECT id, CAST(0 AS BIGINT) AS dist FROM nodes
       |       WHERE id % 101 = 0),
       |${(1 to 4).map(relax).mkString(",\n")}
       |SELECT id AS part, dist FROM r4""".stripMargin
  }

  /** Association rules (a-priori, support/confidence/lift) over order
    * baskets: the classic co-occurrence miner, reframed for curation —
    * "token/domain A implies B" rules are how a pipeline spots template
    * boilerplate and spam clusters. Scale shape: the a-priori
    * FREQUENT-ITEM PREFILTER runs before any pairing, so the basket
    * self-join only ever pairs items that individually clear minsup —
    * the pair blowup is bounded by (frequent items per basket)², and
    * the frequent-item set is by definition small enough to broadcast
    * (AQE does). The frequency threshold is the corpus's own MEAN
    * item support (greatest(2, basket-rows div distinct-items)) — a
    * DENSITY-relative bar, stable whether the corpus grows by
    * repeating the same items more often or by adding new items (an
    * absolute N-derived bar empties out under the latter, which the
    * sf1 replication probe caught). All counts integer;
    * confidence/lift are one final round(·,6) double division each,
    * replayed operation-for-operation in the oracle.
    */
  def qAssoc(s: SparkSession, d: String): DataFrame = {
    val b = graft.CacheRegistry.register(
      Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("i"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = b.agg(countDistinct(col("o")).as("n"),
      count(lit(1)).as("nb"), countDistinct(col("i")).as("ni"))
    val si = b.groupBy(col("i")).agg(count(lit(1)).as("s"))
    val f = si.crossJoin(broadcast(n))
      .filter(col("s") >= greatest(lit(2L), expr("nb div ni")))
      .select(col("i"), col("s"))
    // semi-join the basket rows against the frequent set BEFORE the
    // self-join: Spark won't reorder inner joins without CBO, so a
    // pair-then-filter formulation would run the quadratic fan-out
    // over ALL items first — the exact blowup a-priori exists to avoid
    val bf = b.join(broadcast(f.select(col("i"))), Seq("i"), "left_semi")
    val pairs = bf.alias("a")
      .join(bf.alias("c"), col("a.o") === col("c.o") && col("a.i") < col("c.i"))
      .join(f.select(col("i").as("ia2"), col("s").as("sup_a")),
        col("a.i") === col("ia2"))
      .join(f.select(col("i").as("ib2"), col("s").as("sup_b")),
        col("c.i") === col("ib2"))
      .groupBy(col("a.i").as("part_a"), col("c.i").as("part_b"),
        col("sup_a"), col("sup_b"))
      .agg(count(lit(1)).as("sup_pair"))
      .filter(col("sup_pair") >= 2)
    pairs.crossJoin(broadcast(n)).select(
      col("part_a"), col("part_b"), col("sup_pair"),
      col("sup_a"), col("sup_b"),
      round(col("sup_pair").cast("double") / col("sup_a").cast("double"), 6)
        .as("conf_ab"),
      round(col("sup_pair").cast("double") / col("sup_b").cast("double"), 6)
        .as("conf_ba"),
      round(col("sup_pair").cast("double") * col("n").cast("double") /
        (col("sup_a").cast("double") * col("sup_b").cast("double")), 6)
        .as("lift"))
  }

  val qAssocSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
      |           FROM lineitem),
      |n AS (SELECT count(DISTINCT o) AS n, count(*) AS nb,
      |        count(DISTINCT i) AS ni FROM b),
      |si AS (SELECT i, count(*) AS s FROM b GROUP BY 1),
      |f AS (SELECT i, s FROM si, n WHERE s >= greatest(2, nb // ni)),
      |p AS (
      |  SELECT a.i AS part_a, c.i AS part_b, fa.s AS sup_a, fb.s AS sup_b,
      |    count(*) AS sup_pair
      |  FROM b a JOIN b c ON a.o = c.o AND a.i < c.i
      |  JOIN f fa ON a.i = fa.i JOIN f fb ON c.i = fb.i
      |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2)
      |SELECT part_a, part_b, sup_pair, sup_a, sup_b,
      |  round(CAST(sup_pair AS DOUBLE) / CAST(sup_a AS DOUBLE), 6) AS conf_ab,
      |  round(CAST(sup_pair AS DOUBLE) / CAST(sup_b AS DOUBLE), 6) AS conf_ba,
      |  round(CAST(sup_pair AS DOUBLE) * CAST(n AS DOUBLE) /
      |    (CAST(sup_a AS DOUBLE) * CAST(sup_b AS DOUBLE)), 6) AS lift
      |FROM p, n""".stripMargin

  /** Item-item collaborative filtering: binary-basket cosine
    * sim(a,b) = co / sqrt(s_a · s_b), top-3 neighbors per item — the
    * "related items" / nearest-corpus-peers primitive, structurally
    * the sparse analogue of q_ann_topk (co-occurrence replaces the
    * dot product; the inverted basket index replaces the broadcast
    * scan). Scale shape: pair generation is keyed by basket id and
    * pruned to co ≥ 2 BEFORE the ranking window, and the window
    * partitions by item (never a global sort). sqrt of an integer
    * product is deterministic IEEE in both engines; one final
    * round(·,6).
    */
  def qItemCf(s: SparkSession, d: String): DataFrame = {
    val b = graft.CacheRegistry.register(
      Tables.lineitem(s, d)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("i"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val si = b.groupBy(col("i")).agg(count(lit(1)).as("s"))
    val co = b.alias("a")
      .join(b.alias("c"), col("a.o") === col("c.o") && col("a.i") < col("c.i"))
      .groupBy(col("a.i").as("ia"), col("c.i").as("ib"))
      .agg(count(lit(1)).as("co"))
      .filter(col("co") >= 2)
    // symmetrize so every item ranks ALL its neighbors
    val sym = co.unionByName(
      co.select(col("ib").as("ia"), col("ia").as("ib"), col("co")))
    val scored = sym
      .join(si.select(col("i").as("ia"), col("s").as("s_item")), Seq("ia"))
      .join(si.select(col("i").as("ib"), col("s").as("s_nbr")), Seq("ib"))
      .withColumn("sim", round(col("co").cast("double") /
        sqrt((col("s_item") * col("s_nbr")).cast("double")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ia"))
      .orderBy(col("sim").desc, col("ib").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("ia").as("item"), col("ib").as("neighbor"),
        col("co"), col("s_item"), col("s_nbr"), col("sim"), col("rank"))
  }

  val qItemCfSql: String =
    """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS i
      |           FROM lineitem),
      |si AS (SELECT i, count(*) AS s FROM b GROUP BY 1),
      |co AS (
      |  SELECT a.i AS ia, c.i AS ib, count(*) AS co
      |  FROM b a JOIN b c ON a.o = c.o AND a.i < c.i
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |sym AS (SELECT ia, ib, co FROM co
      |        UNION ALL SELECT ib, ia, co FROM co),
      |sc AS (
      |  SELECT sym.ia, sym.ib, sym.co, sa.s AS s_item, sb.s AS s_nbr,
      |    round(CAST(sym.co AS DOUBLE) /
      |      sqrt(CAST(sa.s * sb.s AS DOUBLE)), 6) AS sim
      |  FROM sym JOIN si sa ON sym.ia = sa.i JOIN si sb ON sym.ib = sb.i),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY ia
      |    ORDER BY sim DESC, ib ASC) AS rank FROM sc)
      |SELECT ia AS item, ib AS neighbor, co, s_item, s_nbr, sim, rank
      |FROM r WHERE rank <= 3""".stripMargin

  /** q_sssp served FROM the persisted src-bucketed adjacency
    * (graft.ops.GraphStore): the edge list lands pre-hashed at every
    * relaxation round's join, so only the vertex-sized distance frame
    * exchanges — the iteration substrate a 100 TB graph job reuses
    * across every algorithm and every run. Same oracle as q_sssp BY
    * DESIGN: the persisted probe must reproduce the in-query BFS
    * bit-for-bit.
    */
  def qSsspPersisted(s: SparkSession, d: String): DataFrame = {
    val edges = coPurchaseEdges(s, d)
    val nodes = edges.select(col("src").as("id")).distinct()
    val seeds = nodes.filter(col("id") % 101 === 0)
    val table = "graft_copurchase_edges_" + d.replaceAll("[^A-Za-z0-9]", "_")
    graft.ops.GraphStore.ensureEdges(edges, table, nBuckets = 8)
    graft.ops.GraphStore.bfs(s, table, seeds, rounds = 4)
      .select(col("id").as("part"), col("dist"))
  }

  /** TrustRank (personalized PageRank) from the SAME seed set as
    * q_sssp on the SAME co-purchase graph: where BFS answers "how many
    * hops from a trusted seed", trust rank answers "how much damped
    * trust flows there" — the classic web-curation pair (seed a few
    * audited domains, propagate; the two signals disagree exactly
    * where link MASS and link DISTANCE disagree). graft.ops.PageRank
    * .personalized: all teleport mass on the seeds, quantized-integer
    * iteration, unreachable vertices at exactly 0.
    */
  def qTrustrank(s: SparkSession, d: String): DataFrame = {
    val edges = coPurchaseEdges(s, d)
    val nodes = edges.select(col("src").as("id")).distinct()
    val seeds = nodes.filter(col("id") % 101 === 0)
    graft.ops.PageRank.personalized(nodes, seeds, edges,
      damping = 0.85, iters = 5)
      .select(col("id").as("part"), col("trust"))
  }

  val qTrustrankSql: String = {
    val sc = graft.ops.PageRank.Scale
    val dmp = 0.85
    val base = Math.round((1.0 - dmp) * sc)
    val num = Math.round(dmp * 100)
    // exact integer damping: (num·s + 50) // 100 — no float multiply,
    // no .5-boundary ambiguity between engines (see PageRank.personalized)
    def iter(n: Int) =
      s"""r$n AS (
         |  SELECT n.id,
         |    cast(n.is_seed * $base +
         |      (($num * cast(coalesce(s.s, 0) as bigint)) + 50) // 100
         |      as bigint) AS r
         |  FROM v n LEFT JOIN (
         |    SELECT e2.dst, sum(r.r // e2.outdeg) AS s
         |    FROM e2 JOIN r${n - 1} r ON e2.src = r.id GROUP BY e2.dst) s
         |    ON n.id = s.dst)""".stripMargin
    s"""WITH $coPurchaseEdgesSql,
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |e2 AS (SELECT edges.src, edges.dst, deg.outdeg
       |       FROM edges JOIN deg USING (src)),
       |v AS (SELECT id, CASE WHEN id % 101 = 0 THEN 1 ELSE 0 END AS is_seed
       |      FROM nodes),
       |r0 AS (SELECT id, cast(is_seed * $sc as bigint) AS r FROM v),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT id AS part, cast(r // 1000 as double) / 1000000.0 AS trust
       |FROM r5""".stripMargin
  }

  /** Fixed-round k-core peeling (k=12, 4 rounds) on the bipartite
    * cust–supp graph (NOT the co-purchase projection the LPA/
    * modularity/BFS queries use — peeling has no 2-coloring
    * degeneracy, so the bipartite structure is fine here):
    * the density gate — vertices whose degree survives repeated
    * removal of sub-k vertices, with residual degree and a
    * self-reported convergence flag (graft.ops.KCore). k sits at the
    * customer-side median degree, so the peel cascades non-trivially
    * at every scale factor.
    */
  def qKcore(s: SparkSession, d: String): DataFrame = {
    val edges = bipartiteEdges(s, d)
    val nodes = edges.select(col("src").as("id")).distinct()
    graft.ops.KCore.run(nodes, edges, k = 12, rounds = 4)
      .select(
        when(col("id") % 2 === 0, "cust").otherwise("supp").as("kind"),
        expr("id div 2").as("node_key"),
        col("deg"),
        col("converged"))
  }

  val qKcoreSql: String = {
    val k = 12
    def peel(n: Int) =
      s"""d$n AS (
         |  SELECT e.src AS id, count(*) AS c FROM edges e
         |  JOIN a${n - 1} s ON e.src = s.id
         |  JOIN a${n - 1} t ON e.dst = t.id
         |  GROUP BY 1),
         |a$n AS (SELECT id FROM d$n WHERE c >= $k)""".stripMargin
    s"""WITH $bipartiteEdgesSql,
       |a0 AS (SELECT id FROM nodes),
       |${(1 to 4).map(peel).mkString(",\n")},
       |fd AS (
       |  SELECT a.id, coalesce(d.c, 0) AS deg
       |  FROM a4 a LEFT JOIN (
       |    SELECT e.src AS id, count(*) AS c FROM edges e
       |    JOIN a4 s ON e.src = s.id
       |    JOIN a4 t ON e.dst = t.id
       |    GROUP BY 1) d ON a.id = d.id)
       |SELECT CASE WHEN id % 2 = 0 THEN 'cust' ELSE 'supp' END AS kind,
       |  id // 2 AS node_key, deg,
       |  (SELECT count(*) FROM a4) = (SELECT count(*) FROM a3) AS converged
       |FROM fd""".stripMargin
  }

  /** Brute-force cosine top-3 in Johnson-Lindenstrauss PROJECTED space
    * (64 → 16 dims): the dimensionality-reduction preprocessing for
    * corpus-scale similarity. The oracle recomputes the deterministic
    * hyperplanes from their integer formula inside SQL, so projection
    * and search both hash-replay.
    */
  def qAnnRp(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val proj = emb.select(col("vec_id"),
      Ann.project(col("embedding"), outDim = 16).as("pvec"))
    Ann.bruteForceTopK(proj, proj.filter(col("vec_id") < 8),
      "vec_id", "pvec", k = 3)
  }

  val qAnnRpSql: String = {
    def cos(a: String, b: String) = cosSql(a, b)
    s"""WITH ${jlProjCte(16, 4096)},
       |sims AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${cos("q.pvec", "c.pvec")} AS sim_raw
       |  FROM pr q JOIN pr c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 8),
       |ranked AS (
       |  SELECT query_id, neighbor_id, sim_raw,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim_raw DESC, neighbor_id ASC) AS rank
       |  FROM sims)
       |SELECT query_id, neighbor_id, round(sim_raw, 6) AS sim, rank
       |FROM ranked WHERE rank <= 3""".stripMargin
  }

  /** Hybrid-retrieval fusion: reciprocal-rank fusion of the EXACT
    * full-space cosine top-10 and the JL-projected-space top-10 —
    * integer-quantized contributions make the fused score an exact
    * sum, so even the combination of two float-heavy retrievers
    * hash-replays.
    */
  def qRrf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 8)
    val full = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
    val proj = emb.select(col("vec_id"),
      Ann.project(col("embedding"), outDim = 16).as("pvec"))
    val projected = Ann.bruteForceTopK(proj, proj.filter(col("vec_id") < 8),
      "vec_id", "pvec", k = 10)
      .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
    graft.sim.Rrf.fuse(Seq(full, projected), k0 = 60, k = 5)
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("rrf_score"), col("n_lists"), col("rank"))
  }

  val qRrfSql: String = {
    def cos(a: String, b: String) = cosSql(a, b)
    s"""WITH ${jlProjCte(16, 4096)},
       |full_r AS (
       |  SELECT query_id, id, rank FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cos("q.embedding", "c.embedding")} DESC,
       |                 c.vec_id ASC) AS rank
       |    FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < 8) WHERE rank <= 10),
       |proj_r AS (
       |  SELECT query_id, id, rank FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cos("q.pvec", "c.pvec")} DESC,
       |                 c.vec_id ASC) AS rank
       |    FROM pr q JOIN pr c ON c.vec_id <> q.vec_id
       |    WHERE q.vec_id < 8) WHERE rank <= 10),
       |u AS (SELECT * FROM full_r UNION ALL SELECT * FROM proj_r),
       |sc AS (
       |  SELECT query_id, id,
       |    cast(sum(1000000000 // (60 + rank)) as bigint) AS rrf_score,
       |    count(*) AS n_lists
       |  FROM u GROUP BY query_id, id)
       |SELECT query_id, id AS neighbor_id, rrf_score, n_lists, rank FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY rrf_score DESC, id ASC) AS rank
       |  FROM sc) WHERE rank <= 5""".stripMargin
  }

  /** Distributed BPE vocabulary training, four merge rounds on the
    * document corpus — the ITERATIVE trainer (pair-count argmax +
    * corpus-wide merge rewrite per round) hash-replays exactly in
    * DuckDB via unrolled CTEs, the k-means discipline applied to
    * subword learning.
    */
  def qBpe(s: SparkSession, d: String): DataFrame =
    graft.text.Bpe.merges(s, Tables.documents(s, d), "text", steps = 4)

  /** Unrolled-BPE CTE prologue shared by the trainer and encoder
    * oracles: ends with `s{steps}`, the (w, cnt, sym) table of every
    * distinct word segmented under all learned merges, plus `m1..m`
    * holding each round's winning pair.
    */
  private def bpeCtes(steps: Int): String = {
    def round(r: Int) =
      s"""p$r AS (
         |  SELECT sym[i] AS a, sym[i+1] AS b, cnt
         |  FROM s${r - 1}, unnest(range(1, len(sym))) AS t(i)),
         |m$r AS (
         |  SELECT a, b, cast(sum(cnt) as bigint) AS w
         |  FROM p$r GROUP BY a, b ORDER BY w DESC, a ASC, b ASC LIMIT 1),
         |s$r AS (
         |  -- LEFT JOIN ON true, not CROSS JOIN: an exhausted round
         |  -- (empty m) must leave the word table unchanged, matching
         |  -- the trainer's early stop, not wipe it
         |  SELECT s.w, s.cnt,
         |    CASE WHEN m.a IS NULL THEN s.sym
         |    ELSE list_reduce(list_transform(s.sym, c -> [c]),
         |      (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m.a AND x[1] = m.b
         |                  THEN list_append(acc[:-2], m.a || m.b)
         |                  ELSE list_concat(acc, x) END) END AS sym
         |  FROM s${r - 1} s LEFT JOIN m$r m ON true)""".stripMargin
    s"""WITH w0 AS (
       |  SELECT w, count(*) AS cnt FROM (
       |    SELECT unnest($toksSql) AS w FROM documents) GROUP BY w),
       |s0 AS (SELECT w, cnt, list_transform(range(1, len(w) + 1), i -> w[i]) AS sym
       |       FROM w0),
       |${(1 to steps).map(round).mkString(",\n")}""".stripMargin
  }

  val qBpeSql: String =
    s"""${bpeCtes(4)}
       |${(1 to 4).map(r =>
            s"SELECT $r AS step, a AS lhs, b AS rhs, w AS weight FROM m$r")
          .mkString("\nUNION ALL\n")}""".stripMargin

  /** BPE encoding under the learned merges: per-document whitespace
    * token and subword counts — the vocabulary-compression report.
    * The merge chain folds over the DISTINCT-word table only; the
    * corpus joins against that map.
    */
  def qBpeEncode(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val m = graft.text.Bpe.train(docs, "text", steps = 4)
    graft.text.Bpe.encode(docs, "doc_id", "text", m)
  }

  val qBpeEncodeSql: String =
    s"""${bpeCtes(4)},
       |enc AS (SELECT w, len(sym) AS n_sub FROM s4),
       |toks AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
       |p AS (SELECT t.doc_id, count(*) AS n_tokens,
       |        cast(sum(e.n_sub) as bigint) AS n_subwords
       |      FROM toks t JOIN enc e USING (w) GROUP BY t.doc_id)
       |SELECT d.doc_id, coalesce(p.n_tokens, 0) AS n_tokens,
       |  coalesce(p.n_subwords, 0) AS n_subwords
       |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin

  /** BM25 keyword retrieval: top-10 documents for three literal
    * keyword queries — the lexical complement to the ANN family, with
    * per-(term, doc) contributions quantized so the float-heavy score
    * hash-replays in DuckDB. One query term ('watermark') is absent
    * from the corpus, pinning the missing-postings path.
    */
  private val Bm25Queries = Seq(
    ("q1", "slow hash join"),
    ("q2", "stream window watermark"),
    ("q3", "customer order data"))

  def qBm25(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Bm25.topK(Tables.documents(s, d), "doc_id", "text",
      Bm25Queries.toDF("query_id", "qtext"), k = 10)
  }

  /** BM25 served FROM the persisted inverted index
    * (graft.text.Bm25Index) — the lexical serving path: postings
    * bucketed by term, corpus scalars as table-property literals,
    * probe = broadcast query terms into the postings scan. Same
    * oracle as `q_bm25` BY DESIGN: the persisted probe must
    * reproduce the in-query operator's ranking bit-for-bit.
    */
  def qBm25Persisted(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val table = "graft_bm25_idx_" + d.replaceAll("[^A-Za-z0-9]", "_")
    graft.text.Bm25Index.ensure(docs, "doc_id", "text", table, 8)
    graft.text.Bm25Index.topK(s, table,
      Bm25Queries.toDF("query_id", "qtext"), "doc_id", k = 10)
  }

  val qBm25Sql: String = {
    val sc = Bm25.Scale
    val k1 = 1.2
    val b = 0.75
    val qtoksSql = toksSql.replace("trim(text)", "trim(qtext)")
    val values = Bm25Queries.map { case (id, t) => s"('$id', '$t')" }
      .mkString(", ")
    s"""WITH q AS (SELECT * FROM (VALUES $values) AS v(query_id, qtext)),
       |toks AS (SELECT doc_id AS id, unnest($toksSql) AS tok FROM documents),
       |tf AS (SELECT id, tok, count(*) AS tf FROM toks GROUP BY id, tok),
       |dl AS (SELECT id, count(*) AS dl FROM toks GROUP BY id),
       |stats AS (SELECT cast(count(*) as bigint) AS n_docs,
       |                 cast(sum(dl) as bigint) AS n_toks FROM dl),
       |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
       |qt AS (SELECT query_id, unnest(list_distinct($qtoksSql)) AS tok FROM q),
       |c AS (
       |  SELECT qt.query_id, tf.id,
       |    cast(round(
       |      ln((cast(n_docs as double) - cast(df as double) + 0.5) /
       |         (cast(df as double) + 0.5) + 1.0) *
       |      (cast(tf as double) * ${k1 + 1.0} /
       |       (cast(tf as double) + $k1 * (${1.0 - b} +
       |        $b * cast(dl as double) /
       |        (cast(n_toks as double) / cast(n_docs as double))))) *
       |      $sc) as bigint) AS c
       |  FROM qt JOIN tf USING (tok) JOIN dfq USING (tok)
       |  JOIN dl ON tf.id = dl.id CROSS JOIN stats),
       |s2 AS (SELECT query_id, id, cast(sum(c) as bigint) AS sc
       |       FROM c GROUP BY query_id, id),
       |r AS (SELECT query_id, id, sc, row_number() OVER (
       |        PARTITION BY query_id ORDER BY sc DESC, id ASC) AS rank
       |      FROM s2)
       |SELECT query_id, id AS doc_id,
       |  round(cast(sc as double) / $sc.0, 6) AS score, rank
       |FROM r WHERE rank <= 10""".stripMargin
  }

  /** CDC changelog application: fold the back half of the event stream
    * (as a changelog with 'error' rows as tombstones) into the
    * snapshot materialized from the front half — the incremental
    * corpus-refresh primitive, one max_by shuffle per stage, no
    * window sort.
    */
  def qCdcUpsert(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.TimestampType
    val ev = Tables.events(s, d)
    val cut = lit("2024-01-16 00:00:00").cast(TimestampType)
    val isDel = col("event_type") === "error"
    val before = ev.filter(col("ts") < cut)
    val base = graft.ops.Upsert.applyChangelog(before.limit(0), before,
      Seq("user_id"), Seq("ts", "event_id"), isDel)
    graft.ops.Upsert.applyChangelog(base, ev.filter(col("ts") >= cut),
      Seq("user_id"), Seq("ts", "event_id"), isDel)
  }

  val qCdcUpsertSql: String =
    """WITH snap AS (
      |  SELECT user_id, event_id, ts, event_type, value, props FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00')
      |  WHERE rn = 1 AND event_type <> 'error'),
      |u AS (
      |  SELECT user_id, event_id, ts, event_type, value, props,
      |    false AS del FROM snap
      |  UNION ALL
      |  SELECT user_id, event_id, ts, event_type, value, props,
      |    (event_type = 'error') AS del
      |  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00')
      |SELECT user_id, event_id, ts, event_type, value, props FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) AS rn FROM u)
      |WHERE rn = 1 AND NOT del""".stripMargin

  // ---------------------------------------------------------- multimodal

  /** Binary-column metadata: never decodes the payload. */
  def qBinaryMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.metadata(
      Multimodal.withPayload(Tables.documents(s, d), "text"), "doc_id")

  val qBinaryMetaSql: String =
    """SELECT doc_id,
      |  octet_length(cast(text as blob)) AS byte_len,
      |  sha256(text) AS sha256
      |FROM documents""".stripMargin

  /** Stub-decoded media features via mapPartitions (typed Dataset
    * path). Even this JVM-side codec is oracle-checkable because the
    * fake decode is pure arithmetic on payload bytes, replicated in
    * SQL via per-char ascii sums.
    */
  def qMediaFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeFeatures(
      s, Multimodal.withPayload(Tables.documents(s, d), "text"), "doc_id")
      .toDF()

  val qMediaFeaturesSql: String =
    """WITH b AS (
      |  SELECT doc_id AS id, length(text) AS n,
      |    ascii(substr(text, 1, 1)) AS b0,
      |    ascii(substr(text, 2, 1)) AS b1,
      |    list_sum(list_transform(range(1, length(text) + 1),
      |      i -> ascii(substr(text, i, 1)))) AS bsum
      |  FROM documents)
      |SELECT id, n AS "byteLen",
      |  16 + abs(CASE WHEN n > 0 THEN b0 ELSE 0 END) % 48 AS width,
      |  16 + abs(CASE WHEN n > 1 THEN b1 ELSE 0 END) % 48 AS height,
      |  1 + n % 3 AS channels,
      |  CASE WHEN n > 0
      |    THEN floor((bsum * 1.0 / n / 255.0) * 1e6 + 0.5) / 1e6
      |    ELSE 0.0 END AS brightness
      |FROM b""".stripMargin

  /** Nearest-neighbor resize through the stub codec boundary: scalar
    * features (dims + byte-sum checksum) are oracle-verified; the
    * resized binary itself is spec-tested (SQL does not ship blobs).
    */
  def qMediaResize(s: SparkSession, d: String): DataFrame =
    Multimodal.resize(
      s, Multimodal.withPayload(Tables.documents(s, d), "text"), "doc_id",
      outW = 8, outH = 8)
      .toDF()
      .select(col("id"), col("srcW"), col("srcH"),
        length(col("resized")).as("out_len"), col("checksum"))

  /** Perceptual-hash image dedup over the stub codec: every payload's
    * 8×8 average-hash plus how many corpus images share it — the
    * multimodal twin of exact text dedup, with the pixel sampling AND
    * the integer-exact thresholding replicated in SQL.
    */
  def qPhash(s: SparkSession, d: String): DataFrame = {
    // persisted: the codec map feeds both the per-hash counts and the
    // join's probe side — without the cache the whole decode pipeline
    // runs twice
    val ph = graft.CacheRegistry.register(
      Multimodal.perceptualHash(
        s, Multimodal.withPayload(Tables.documents(s, d), "text"), "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val counts = ph.groupBy(col("phash")).agg(count(lit(1)).as("n_same"))
    ph.join(counts, Seq("phash"))
      .select(col("doc_id"), col("phash"), col("n_same"))
  }

  val qPhashSql: String =
    """WITH b AS (
      |  SELECT doc_id AS id, length(text) AS n,
      |    16 + abs(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE 0 END) % 48 AS w,
      |    16 + abs(CASE WHEN length(text) > 1 THEN ascii(substr(text, 2, 1)) ELSE 0 END) % 48 AS h
      |  FROM documents),
      |px AS (
      |  SELECT id,
      |    list_transform(range(0, 64),
      |      i -> CASE WHEN n > 0
      |        THEN ascii(substr(text, cast((((i % 8) * w) // 8 + (((i // 8) * h) // 8) * w) % n + 1 as bigint), 1))
      |        ELSE 0 END) AS s
      |  FROM b JOIN documents ON b.id = documents.doc_id),
      |ph AS (
      |  SELECT id AS doc_id,
      |    array_to_string(list_transform(s,
      |      v -> CASE WHEN v * 64 > list_sum(s) THEN '1' ELSE '0' END), '') AS phash
      |  FROM px)
      |SELECT doc_id, phash, n_same FROM ph
      |JOIN (SELECT phash, count(*) AS n_same FROM ph GROUP BY phash) USING (phash)""".stripMargin

  val qMediaResizeSql: String =
    """WITH b AS (
      |  SELECT doc_id AS id, length(text) AS n,
      |    16 + abs(CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE 0 END) % 48 AS w,
      |    16 + abs(CASE WHEN length(text) > 1 THEN ascii(substr(text, 2, 1)) ELSE 0 END) % 48 AS h
      |  FROM documents),
      |px AS (
      |  SELECT id, n, w, h,
      |    cast(list_sum(list_transform(range(0, 64),
      |      i -> CASE WHEN n > 0
      |        THEN ascii(substr(text, cast((((i % 8) * w) // 8 + (((i // 8) * h) // 8) * w) % n + 1 as bigint), 1))
      |        ELSE 0 END)) as bigint) AS checksum
      |  FROM b JOIN documents ON b.id = documents.doc_id)
      |SELECT id, w AS "srcW", h AS "srcH", 64 AS out_len, checksum
      |FROM px""".stripMargin

  /** Frame-sampling plumbing: deterministic split/explode, every-2nd
    * frame kept.
    */
  def qFrameSample(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.withPayload(Tables.documents(s, d), "text"),
      "doc_id", frameBytes = 64, everyNth = 2)
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame_bytes")).as("frame_len"))

  val qFrameSampleSql: String =
    """SELECT doc_id, u.i AS frame_idx,
      |  least(64, length(text) - u.i * 64) AS frame_len
      |FROM documents,
      |  unnest(range(0, cast(ceil(length(text) / 64.0) as bigint))) AS u(i)
      |WHERE u.i % 2 = 0""".stripMargin

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
    val wl = graft.text.UnigramLm.score(docs, "doc_id", "text")
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
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

  private val PplLo = -12.0
  private val PplHi = 0.0
  private val PplBins = 96
  private val PplQ1 = 1.0 / 3
  private val PplQ2 = 2.0 / 3

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

  /** k-NN GRAPH construction via LSH-seeded NN-Descent
    * (graft.sim.KnnGraph): every node's top-3 cosine neighbors over a
    * hash-thinned node set (vec_id % 4 — tracks every SF), seeded by
    * 4-plane sign-LSH blocking and refined by two
    * neighbor-of-my-neighbor rounds. The per-query ANN paths answer
    * "neighbors of these few rows"; this is the all-nodes graph that
    * SemDedup clustering, graph dedup, and hard-negative mining
    * consume. The oracle replays the ENTIRE trajectory — seed buckets,
    * both expansion rounds, every top-k cut — so the hash matches only
    * if the full NN-Descent run is bit-identical (left-fold dots,
    * (sim desc, dst asc) tie order).
    */
  def qKnnGraph(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.embeddings(s, d).filter(col("vec_id") % 4 === 0)
    graft.sim.KnnGraph.build(nodes, "vec_id", "embedding",
      k = 3, rounds = 2, numPlanes = 4)
  }

  private def knnCosSql(a: String, b: String, an: String, bn: String) =
    s"""CASE WHEN $an * $bn > 0
       |  THEN ${listDotSql(a, b)} / ($an * $bn)
       |  ELSE 0.0 END""".stripMargin

  /** The shared NN-Descent CTE prefix (nodes → n → seed → g0 → … →
    * s2/g2) replaying graft.sim.KnnGraph.build(k=3, rounds=2,
    * numPlanes=4) over the vec_id % 4 node set — single-sourced for
    * `q_knn_graph` (the graph itself) and `q_knn_recall` (the
    * measured seed-repair readout).
    */
  private lazy val knnGraphCtesSql: String = {
    // one refinement round: undirected expand + keep-current, dedup,
    // exact re-score, top-3 per src — the KnnGraph.build loop body
    def round(gIn: String, uOut: String, cOut: String, sOut: String,
        gOut: String) =
      s"""$uOut AS MATERIALIZED (SELECT src, dst FROM $gIn
         |  UNION ALL SELECT dst AS src, src AS dst FROM $gIn),
         |$cOut AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
         |  SELECT a.src AS src, b.dst AS dst
         |  FROM $uOut a JOIN $uOut b ON a.dst = b.src
         |  WHERE a.src <> b.dst
         |  UNION ALL SELECT src, dst FROM $gIn)),
         |$sOut AS MATERIALIZED (SELECT c.src, c.dst,
         |    ${knnCosSql("sa.vec", "sb.vec", "sa.nrm", "sb.nrm")} AS sim
         |  FROM $cOut c JOIN n sa ON c.src = sa.id
         |               JOIN n sb ON c.dst = sb.id),
         |$gOut AS MATERIALIZED (SELECT src, dst, sim FROM (
         |  SELECT src, dst, sim, row_number() OVER (PARTITION BY src
         |    ORDER BY sim DESC, dst ASC) AS rk FROM $sOut) WHERE rk <= 3)""".stripMargin
    s"""nodes AS (SELECT vec_id AS id, embedding AS vec
       |  FROM embeddings WHERE vec_id % 4 = 0),
       |n AS MATERIALIZED (SELECT id, vec, sqrt(${listDotSql("vec", "vec")}) AS nrm,
       |  ${lshKeySql("vec", 4)} AS b1,
       |  ${lshKeySql("vec", 4, offset = graft.sim.KnnGraph.SeedTableOffset)}
       |    AS b2 FROM nodes),
       |sc AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
       |  SELECT a.id AS src, b.id AS dst FROM n a JOIN n b
       |    ON a.b1 = b.b1 AND a.id <> b.id
       |  UNION ALL
       |  SELECT a.id AS src, b.id AS dst FROM n a JOIN n b
       |    ON a.b2 = b.b2 AND a.id <> b.id)),
       |seed AS (SELECT c.src, c.dst,
       |    ${knnCosSql("sa.vec", "sb.vec", "sa.nrm", "sb.nrm")} AS sim
       |  FROM sc c JOIN n sa ON c.src = sa.id
       |            JOIN n sb ON c.dst = sb.id),
       |g0 AS MATERIALIZED (SELECT src, dst, sim FROM (
       |  SELECT src, dst, sim, row_number() OVER (PARTITION BY src
       |    ORDER BY sim DESC, dst ASC) AS rk FROM seed) WHERE rk <= 3),
       |${round("g0", "u1", "c1", "s1", "g1")},
       |${round("g1", "u2", "c2", "s2", "g2")}""".stripMargin
  }

  lazy val qKnnGraphSql: String =
    s"""WITH $knnGraphCtesSql
       |SELECT src, dst, round(sim, 6) AS sim, rank FROM (
       |  SELECT src, dst, sim, row_number() OVER (PARTITION BY src
       |    ORDER BY sim DESC, dst ASC) AS rank FROM s2) WHERE rank <= 3""".stripMargin

  /** Measured NN-Descent recall readout: seed graph (rounds = 0) vs
    * refined graph (rounds = 2) against the EXACT top-3 graph, as an
    * oracle-verified metric — the "measure, don't claim" discipline
    * (q_minhash_recall, the Hilbert footer-skip table) applied to the
    * graph builder. The spec asserts improvement; this query makes
    * the exact numbers themselves hash-gated at every SF.
    *
    * The exact side is computed over a BOUNDED probe set — the
    * [[KnnRecallProbes]] nodes with the smallest (hash60(id), id), the
    * same deterministic hash-ordered draw as ivfTopK's centroid sample
    * and the q_ann_* few-row probe discipline — so the readout's cost
    * is probes×N (one corpus scan against a broadcast probe side),
    * not N²: recall estimated on a fixed uniform sample stays honest
    * while the plan stays linear in corpus size. (The former
    * all-nodes exact graph was the suite's one quadratic plan — fine
    * at sf ≤ 1, the first thing to die at 100×.)
    */
  val KnnRecallProbes = 64

  def qKnnRecall(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.embeddings(s, d).filter(col("vec_id") % 4 === 0)
    // hash-ordered bounded probe draw: plans as TakeOrderedAndProject
    // (no full sort), broadcast into bruteForceTopK's query side
    val probes = nodes.orderBy(
        TextAnalysis.hash60(col("vec_id").cast(StringType)).asc,
        col("vec_id").asc)
      .limit(KnnRecallProbes)
    val exact = Ann.bruteForceTopK(nodes, probes, "vec_id", "embedding", 3)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
    def readout(g: DataFrame, name: String) = {
      val hit = exact.join(g.select(col("src"), col("dst")),
        Seq("src", "dst"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(lit(name).as("variant"), col("n_exact"), col("n_hit"),
          round(col("n_hit").cast(DoubleType) /
            col("n_exact").cast(DoubleType), 6).as("recall"))
    }
    val seed = graft.sim.KnnGraph.build(nodes, "vec_id", "embedding",
      k = 3, rounds = 0, numPlanes = 4)
    // the refined (rounds = 2) graph is exactly what the persisted
    // store holds — serve it instead of paying a second descent
    val refined = knnGraphServe(s, d)
    readout(seed, "seed").union(readout(refined, "refined"))
  }

  lazy val qKnnRecallSql: String =
    s"""WITH $knnGraphCtesSql,
       |pr AS MATERIALIZED (SELECT id, vec, nrm FROM n
       |  ORDER BY ${hash60Sql("cast(id as varchar)")} ASC, id ASC
       |  LIMIT $KnnRecallProbes),
       |ex AS (SELECT src, dst FROM (
       |  SELECT a.id AS src, b.id AS dst, row_number() OVER (
       |      PARTITION BY a.id ORDER BY
       |        ${knnCosSql("a.vec", "b.vec", "a.nrm", "b.nrm")} DESC,
       |        b.id ASC) AS rk
       |  FROM pr a JOIN n b ON a.id <> b.id) WHERE rk <= 3),
       |hit0 AS (SELECT count(*) AS n_hit FROM ex JOIN g0 USING (src, dst)),
       |hit2 AS (SELECT count(*) AS n_hit FROM ex JOIN g2 USING (src, dst)),
       |tot AS (SELECT count(*) AS n_exact FROM ex)
       |SELECT 'seed' AS variant, n_exact, n_hit,
       |  round(cast(n_hit as double) / cast(n_exact as double), 6) AS recall
       |FROM tot CROSS JOIN hit0
       |UNION ALL
       |SELECT 'refined' AS variant, n_exact, n_hit,
       |  round(cast(n_hit as double) / cast(n_exact as double), 6) AS recall
       |FROM tot CROSS JOIN hit2""".stripMargin

  /** Margin-based bitext mining (graft.sim.BitextMine — the
    * LASER/CCMatrix parallel-corpus recipe): the even-id and odd-id
    * embedding halves stand in for source/target sentence
    * collections; forward and backward top-4 cosine neighbors feed
    * the ratio margin cos/((avgF+avgB)/2), and each source keeps its
    * best-margin pair with the ≥1.05 accept verdict. The oracle
    * replays the whole pipeline — both k-NN directions, the
    * DECIMAL-exact neighbor averages, the margin rank — so hub
    * deflation itself is hash-verified.
    */
  def qBitextMargin(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    graft.sim.BitextMine.mine(
      emb.filter(col("vec_id") % 4 === 0),
      emb.filter(col("vec_id") % 4 === 1),
      "vec_id", "embedding", k = 4)
  }

  lazy val qBitextMarginSql: String =
    s"""WITH xs AS (SELECT vec_id AS id, embedding AS vec
       |  FROM embeddings WHERE vec_id % 4 = 0),
       |ys AS (SELECT vec_id AS id, embedding AS vec
       |  FROM embeddings WHERE vec_id % 4 = 1),
       |nx AS (SELECT id, vec, sqrt(${listDotSql("vec", "vec")}) AS nrm FROM xs),
       |ny AS (SELECT id, vec, sqrt(${listDotSql("vec", "vec")}) AS nrm FROM ys),
       |sims AS (SELECT x.id AS xid, y.id AS yid,
       |    CASE WHEN x.nrm * y.nrm > 0
       |      THEN ${listDotSql("x.vec", "y.vec")} / (x.nrm * y.nrm)
       |      ELSE 0.0 END AS sim_raw
       |  FROM nx x CROSS JOIN ny y),
       |fwd AS (SELECT xid, yid, round(sim_raw, 6) AS sim FROM (
       |  SELECT xid, yid, sim_raw, row_number() OVER (PARTITION BY xid
       |    ORDER BY sim_raw DESC, yid ASC) AS rk FROM sims) WHERE rk <= 4),
       |bwd AS (SELECT xid, yid, round(sim_raw, 6) AS sim FROM (
       |  SELECT xid, yid, sim_raw, row_number() OVER (PARTITION BY yid
       |    ORDER BY sim_raw DESC, xid ASC) AS rk FROM sims) WHERE rk <= 4),
       |af AS (SELECT xid, cast(sum(cast(sim as decimal(18,6))) as double)
       |    / count(*) AS avg_f FROM fwd GROUP BY 1),
       |ab AS (SELECT yid, cast(sum(cast(sim as decimal(18,6))) as double)
       |    / count(*) AS avg_b FROM bwd GROUP BY 1),
       |cand AS (SELECT DISTINCT src, tgt, sim FROM (
       |  SELECT xid AS src, yid AS tgt, sim FROM fwd
       |  UNION ALL SELECT xid AS src, yid AS tgt, sim FROM bwd)),
       |m AS (SELECT c.src, c.tgt, c.sim,
       |    c.sim / ((af.avg_f + ab.avg_b) / 2.0) AS margin
       |  FROM cand c JOIN af ON c.src = af.xid JOIN ab ON c.tgt = ab.yid
       |  WHERE (af.avg_f + ab.avg_b) / 2.0 > 0)
       |SELECT src, tgt, sim, round(margin, 6) AS margin,
       |  margin >= ${graft.sim.BitextMine.AcceptMargin} AS accepted
       |FROM (SELECT src, tgt, sim, margin, row_number() OVER (
       |  PARTITION BY src ORDER BY margin DESC, tgt ASC) AS rk FROM m)
       |WHERE rk = 1""".stripMargin

  /** URL canonicalization → exact-URL dedup (graft.text.UrlOps
    * .canonicalize): a deterministic recrawl zoo — six messy variants
    * per page (uppercase scheme/host, default ports, fragments,
    * www-prefix, utm_ and gclid tracking params, shuffled param order,
    * trailing slash) — collapses onto canonical keys; the http
    * variant stays a separate key (scheme is preserved, not folded).
    * Per canonical URL: docs folded, distinct raw spellings, owning
    * doc, and the eTLD+1 the canonical key feeds into per-domain
    * policy. Canonicalize + group-on-key is THE first dedup a crawl
    * corpus runs — cheaper than any content hash because it needs no
    * document bytes at all.
    */
  def qUrlCanon(s: SparkSession, d: String): DataFrame = {
    import graft.text.{UrlOps => U}
    val docs = Tables.documents(s, d)
    val v = TextAnalysis.hash60(col("doc_id").cast(StringType)) % 6
    val p = pmod(col("doc_id"), lit(50)).cast(StringType)
    val url =
      when(v === 0, concat(lit("https://"), col("source"), lit(".com/page/"),
        p, lit("?a=1&b=2")))
      .when(v === 1, concat(lit("HTTPS://"), upper(col("source")),
        lit(".com:443/page/"), p, lit("?b=2&a=1#frag")))
      .when(v === 2, concat(lit("https://www."), col("source"),
        lit(".com/page/"), p, lit("/?a=1&b=2&utm_source=x")))
      .when(v === 3, concat(lit("https://"), col("source"),
        lit(".com:443/page/"), p, lit("?b=2&utm_campaign=y&a=1")))
      .when(v === 4, concat(lit("https://"), col("source"),
        lit(".com/page/"), p, lit("/?gclid=abc123&a=1&b=2")))
      .otherwise(concat(lit("http://"), col("source"), lit(".com:80/page/"),
        p, lit("?a=1&b=2")))
    docs.withColumn("url", url)
      .withColumn("canon", U.canonicalize(col("url")))
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_raw"),
        min(col("doc_id")).as("owner_doc"))
      .withColumn("domain", U.etld1(U.host(col("canon"))))
  }

  lazy val qUrlCanonSql: String = {
    import graft.text.{UrlOps => U}
    val h = s"${hash60Sql("cast(doc_id as varchar)")} % 6"
    s"""WITH u AS (SELECT doc_id,
       |  CASE WHEN $h = 0 THEN 'https://' || source || '.com/page/' || (doc_id % 50) || '?a=1&b=2'
       |       WHEN $h = 1 THEN 'HTTPS://' || upper(source) || '.com:443/page/' || (doc_id % 50) || '?b=2&a=1#frag'
       |       WHEN $h = 2 THEN 'https://www.' || source || '.com/page/' || (doc_id % 50) || '/?a=1&b=2&utm_source=x'
       |       WHEN $h = 3 THEN 'https://' || source || '.com:443/page/' || (doc_id % 50) || '?b=2&utm_campaign=y&a=1'
       |       WHEN $h = 4 THEN 'https://' || source || '.com/page/' || (doc_id % 50) || '/?gclid=abc123&a=1&b=2'
       |       ELSE 'http://' || source || '.com:80/page/' || (doc_id % 50) || '?a=1&b=2' END AS url
       |FROM documents),
       |c AS (SELECT doc_id, url, ${U.canonicalizeSql("url")} AS canon FROM u),
       |g AS (SELECT canon, count(*) AS n_docs,
       |    count(distinct url) AS n_raw, min(doc_id) AS owner_doc
       |  FROM c GROUP BY 1),
       |d AS (SELECT canon, n_docs, n_raw, owner_doc,
       |  string_split(${U.hostSql("canon")}, '.') AS ls FROM g)
       |SELECT canon, n_docs, n_raw, owner_doc, ${U.etld1Sql("ls")} AS domain
       |FROM d""".stripMargin
  }

  /** Interpolated Kneser–Ney bigram scoring
    * (graft.text.BigramLm.scoreKneserNey): the smoothed sibling of
    * `q_bigram_lm` — absolute discount 0.75, backoff mass routed
    * through CONTINUATION counts (how many distinct left contexts a
    * word follows), the standard fix for MLE's "San Francisco makes
    * Francisco look fluent everywhere" artifact. The oracle replays
    * the discounting, both fanout tables, the continuation total, and
    * the quantized per-doc sums.
    */
  def qKnBigram(s: SparkSession, d: String): DataFrame =
    graft.text.BigramLm.scoreKneserNey(Tables.documents(s, d),
      "doc_id", "text")

  val qKnBigramSql: String = {
    val sc = graft.text.BigramLm.Scale
    val dd = graft.text.BigramLm.Discount
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |u AS (SELECT doc_id,
       |        unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
       |          i -> toks[i] || ' ' || toks[i+1])) AS bg
       |      FROM t),
       |cb AS (SELECT bg, count(*) AS cb FROM u GROUP BY bg),
       |lft AS (SELECT split_part(bg, ' ', 1) AS w1,
       |        cast(sum(cb) as bigint) AS cl, count(*) AS n1l
       |        FROM cb GROUP BY 1),
       |rgt AS (SELECT split_part(bg, ' ', 2) AS w2, count(*) AS n1r
       |        FROM cb GROUP BY 1),
       |tot AS (SELECT count(*) AS n1t FROM cb),
       |q AS (SELECT bg, cast(round(ln(
       |        greatest(cast(cb as double) - $dd, 0.0) / cast(cl as double)
       |        + (($dd * cast(n1l as double)) / cast(cl as double))
       |          * (cast(n1r as double) / cast(n1t as double))) * $sc)
       |        as bigint) AS lp
       |      FROM cb JOIN lft ON split_part(cb.bg, ' ', 1) = lft.w1
       |              JOIN rgt ON split_part(cb.bg, ' ', 2) = rgt.w2
       |              CROSS JOIN tot),
       |p AS (SELECT u.doc_id, count(*) AS n_bigrams,
       |        cast(sum(q.lp) as bigint) AS slp
       |      FROM u JOIN q USING (bg) GROUP BY u.doc_id)
       |SELECT d.doc_id,
       |  coalesce(p.n_bigrams, 0) AS n_bigrams,
       |  round(CASE WHEN p.n_bigrams > 0
       |        THEN cast(p.slp as double) / p.n_bigrams / $sc.0
       |        ELSE 0.0 END, 6) AS avg_logp
       |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin
  }

  /** Stride-scheduled training order (graft.ops.Curriculum): the
    * global interleaved ordering a data loader streams, with each
    * source appearing in any prefix proportionally to its temperature
    * weight √n (T=2 mixing) — the deterministic last mile after
    * q_mix_opt decides the proportions. The oracle replays the
    * within-domain hash-shuffled ranks, the virtual times, and the
    * global (vtime, domain, id) order; the engine computes both ranks
    * range-sharded (never a per-domain or single-reducer window), and
    * the hash matching the oracle's textbook windows is exactly the
    * sharded-rank ≡ global-window law.
    */
  def qCurriculum(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val weights = docs.groupBy(col("source"))
      .agg(sqrt(count(lit(1)).cast(DoubleType)).as("weight"))
    graft.ops.Curriculum.order(docs, "doc_id", "source", weights)
      .select(col("position"), col("id").as("doc_id"),
        col("domain").as("source"), col("domain_rank"), col("vtime"))
  }

  val qCurriculumSql: String =
    s"""WITH k AS (SELECT doc_id, source,
       |  ${hash60Sql("cast(doc_id as varchar)")} AS shuf FROM documents),
       |r AS (SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY shuf, doc_id) - 1
       |      AS dr
       |  FROM k),
       |w AS (SELECT source, sqrt(cast(count(*) as double)) AS wt
       |  FROM documents GROUP BY 1),
       |v AS (SELECT r.doc_id, r.source, r.dr,
       |    (cast(r.dr as double) + 1.0) / w.wt AS vtime
       |  FROM r JOIN w USING (source))
       |SELECT row_number() OVER (ORDER BY vtime, source, doc_id) - 1
       |    AS position,
       |  doc_id, source, dr AS domain_rank, round(vtime, 6) AS vtime
       |FROM v""".stripMargin

  /** Exactly-8-per-source WEIGHTED sample without replacement
    * (graft.ops.Sampling.weightedSampleK — Efraimidis–Spirakis
    * priorities, quality-clamped weights): the principled weighted
    * eval-carving draw. The engine runs the bounded TopKAgg heap (no
    * per-group window); the oracle replays the quantized ln(u)/w
    * priorities with the textbook row_number window — the
    * aggregate ≡ window law, hash-gated.
    */
  def qWeightedK(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
      least(lit(1.0), greatest(lit(0.05),
        TextAnalysis.qualityScore(col("text")))).as("w"))
    graft.ops.Sampling.weightedSampleK(docs, "doc_id", Seq("source"),
      "w", n = 8)
  }

  val qWeightedKSql: String =
    s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks FROM documents),
       |w AS (SELECT doc_id, source,
       |    least(1.0, greatest(0.05, ${qualityExprSql("toks", "text")})) AS w
       |  FROM t),
       |p AS (SELECT doc_id, source,
       |    cast(round(ln(${graft.ops.Sampling.coordinateSql("doc_id")})
       |      / w * 1000000000.0) as bigint) AS pr
       |  FROM w),
       |r AS (SELECT source, doc_id, row_number() OVER (
       |    PARTITION BY source ORDER BY pr DESC, doc_id ASC) AS rnk
       |  FROM p)
       |SELECT source, rnk, doc_id FROM r WHERE rnk <= 8""".stripMargin

  /** SoftDedup per-source readout (graft.dedup.Dedup
    * .softDedupWeights): duplicates are REWEIGHTED (1/cluster-size),
    * not dropped, and the per-source effective token mass — what the
    * training loss actually sees in expectation — is an exact
    * integer-micro sum. The oracle composes the full q_dup_clusters
    * recursive-CC replay, the cluster sizes, the per-doc quantized
    * effective mass, and the per-source rollup.
    */
  def qSoftDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val w = Dedup.softDedupWeights(docs, "doc_id", "text")
    docs.select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).as("n_toks"))
      .join(w, Seq("doc_id"))
      .withColumn("eff_micro",
        round(col("n_toks").cast(DoubleType) * 1e6d /
          col("csize").cast(DoubleType)).cast(LongType))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"),
        sum(col("n_toks")).as("raw_tokens"),
        round(sum(col("eff_micro")).cast(DoubleType) / 1e6d, 6)
          .as("eff_tokens"))
      .withColumn("kept_frac",
        round(col("eff_tokens") / col("raw_tokens").cast(DoubleType), 6))
  }

  lazy val qSoftDedupSql: String =
    s"""WITH cl AS (
       |$qDupClustersSql),
       |cs AS (SELECT cluster_id, count(*) AS csize FROM cl GROUP BY 1),
       |tk AS (SELECT doc_id, source, len($toksSql) AS n_toks FROM documents),
       |p AS (SELECT tk.source, cl.cluster_id, tk.n_toks,
       |    cast(round((cast(tk.n_toks as double) * 1000000.0)
       |      / cast(cs.csize as double)) as bigint) AS eff_micro
       |  FROM tk JOIN cl USING (doc_id) JOIN cs USING (cluster_id)),
       |g AS (SELECT source, count(*) AS n_docs,
       |    count(distinct cluster_id) AS n_clusters,
       |    cast(sum(n_toks) as bigint) AS raw_tokens,
       |    round(cast(sum(eff_micro) as double) / 1000000.0, 6)
       |      AS eff_tokens
       |  FROM p GROUP BY 1)
       |SELECT source, n_docs, n_clusters, raw_tokens, eff_tokens,
       |  round(eff_tokens / cast(raw_tokens as double), 6) AS kept_frac
       |FROM g""".stripMargin

  /** Embedding-space benchmark decontamination
    * (graft.sim.SemanticDecontam): the semantic complement of
    * `q_decontam`'s verbatim n-gram scrub — paraphrased eval leakage
    * has no shared 5-grams but lands at cosine ≈ 1. Eval set = the
    * vec_id % 13 slice; corpus = the complement PLUS planted
    * near-copies (first component shifted +0.125 — cross-engine-exact
    * float arithmetic) that must all be flagged at τ = 0.9 while the
    * natural corpus (max cos ≈ 0.5 against eval) stays clean. One
    * broadcast of the bounded eval side, one narrow corpus pass, one
    * argmax struct aggregate — replayed in the oracle with the
    * textbook window.
    */
  def qSemDecontam(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val evalSet = emb.filter(col("vec_id") % 13 === 0)
      .select(col("vec_id"), col("embedding"))
    val planted = evalSet.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      concat(
        array((element_at(col("embedding"), 1) + lit(0.125f)).cast(FloatType)),
        slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = emb.filter(col("vec_id") % 13 =!= 0)
      .select(col("vec_id"), col("embedding"))
      .union(planted)
    graft.sim.SemanticDecontam.report(corpus, evalSet,
      "vec_id", "embedding", tau = 0.9)
  }

  lazy val qSemDecontamSql: String =
    s"""WITH ev AS (SELECT vec_id AS eval_id, embedding AS evec
       |  FROM embeddings WHERE vec_id % 13 = 0),
       |en AS (SELECT eval_id, evec,
       |  sqrt(${listDotSql("evec", "evec")}) AS en FROM ev),
       |pl AS (SELECT vec_id + 1000000 AS id,
       |    list_prepend(cast(embedding[1] + 0.125 as float),
       |      embedding[2:len(embedding)]) AS cvec
       |  FROM embeddings WHERE vec_id % 13 = 0),
       |co AS (SELECT vec_id AS id, embedding AS cvec
       |  FROM embeddings WHERE vec_id % 13 <> 0
       |  UNION ALL SELECT id, cvec FROM pl),
       |cn AS (SELECT id, cvec,
       |  sqrt(${listDotSql("cvec", "cvec")}) AS cn FROM co),
       |s AS (SELECT cn.id, en.eval_id,
       |    CASE WHEN cn.cn * en.en > 0
       |      THEN ${listDotSql("cn.cvec", "en.evec")} / (cn.cn * en.en)
       |      ELSE 0.0 END AS sim
       |  FROM cn CROSS JOIN en),
       |r AS (SELECT id, sim, eval_id, row_number() OVER (
       |    PARTITION BY id ORDER BY sim DESC, eval_id DESC) AS rk FROM s)
       |SELECT id, round(sim, 6) AS max_sim, eval_id AS nearest_eval,
       |  sim >= 0.9 AS contaminated
       |FROM r WHERE rk = 1""".stripMargin

  /** Per-source lexical diversity: distinct-n/total-n ratios for
    * n = 1, 2, 3 (corpus-level type-token ratios — the Self-BLEU-class
    * health metric; template farms and synthetic spam collapse these
    * ratios relative to varied prose, with the n = 2/3 orders the
    * sharper signal because frame bigrams repeat verbatim) plus
    * per-doc token mass. One explode + grouped distinct count per
    * order; everything partial-aggregates map-side; output is
    * source-sized.
    */
  def qDiversity(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    def stats(n: Int) = docs
      .select(col("source"),
        explode(TextAnalysis.wordNgrams(col("text"), n)).as("g"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as(s"total_$n"),
        countDistinct(col("g")).as(s"distinct_$n"))
    val base = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    Seq(1, 2, 3).map(stats).foldLeft(base)(_.join(_, Seq("source")))
      .select(col("source"), col("n_docs"), col("total_1").as("n_tokens"),
        round(col("distinct_1").cast(DoubleType) /
          col("total_1").cast(DoubleType), 6).as("ttr1"),
        round(col("distinct_2").cast(DoubleType) /
          col("total_2").cast(DoubleType), 6).as("ttr2"),
        round(col("distinct_3").cast(DoubleType) /
          col("total_3").cast(DoubleType), 6).as("ttr3"))
  }

  lazy val qDiversitySql: String = {
    def ngramsSql(n: Int) =
      if (n == 1) "toks"
      else {
        val joined = (0 until n).map(o => s"toks[i+$o]").mkString(" || ' ' || ")
        s"""list_transform(range(1, greatest(len(toks) - ${n - 1}, 0) + 1),
           |  i -> $joined)""".stripMargin
      }
    def statsCte(n: Int) =
      s"""s$n AS (SELECT source, count(*) AS total_$n,
         |    count(distinct g) AS distinct_$n
         |  FROM (SELECT source, unnest(${ngramsSql(n)}) AS g FROM t)
         |  GROUP BY 1)""".stripMargin
    s"""WITH t AS (SELECT source, $toksSql AS toks FROM documents),
       |b AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
       |${statsCte(1)}, ${statsCte(2)}, ${statsCte(3)}
       |SELECT source, n_docs, cast(total_1 as bigint) AS n_tokens,
       |  round(cast(distinct_1 as double) / cast(total_1 as double), 6) AS ttr1,
       |  round(cast(distinct_2 as double) / cast(total_2 as double), 6) AS ttr2,
       |  round(cast(distinct_3 as double) / cast(total_3 as double), 6) AS ttr3
       |FROM b JOIN s1 USING (source) JOIN s2 USING (source)
       |       JOIN s3 USING (source)""".stripMargin
  }

  /** Per-source Zipf slope — the vocabulary health check: natural
    * language's token frequencies follow rank^s with s ≈ −1; template
    * farms and synthetic spam bend the curve (flat head or cliff
    * tail). The fit is OLS of ln(count) on ln(rank) over the BOUNDED
    * top-64 tokens per source (graft.functions.TopKAgg — map-side
    * partials, no per-source sort), with the log points quantized to
    * integer nano-nats and every OLS sum accumulated EXACTLY
    * (decimal(38) products — a 64-point sum of ~1e20 cross terms
    * overflows a long), so the slope is one double divide over exact
    * integers, hash-replayable.
    */
  def qZipf(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.documents(s, d)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val tops = counts.groupBy(col("source"))
      .agg(graft.functions.TopKAgg.top_k_by(col("cnt"),
        TextAnalysis.hash60(col("tok")), 64).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("p", "t")))
      .select(col("source"), (col("p") + 1).cast(LongType).as("rank"),
        col("t.ord").as("cnt"))
    val pts = tops.select(col("source"), col("rank"), col("cnt"),
      round(log(col("rank").cast(DoubleType)) * 1e9d).cast(LongType).as("xq"),
      round(log(col("cnt").cast(DoubleType)) * 1e9d).cast(LongType).as("yq"))
    val dec = DecimalType(38, 0)
    val agg = pts.groupBy(col("source")).agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("xq").cast(dec)).as("sx"),
      sum(col("yq").cast(dec)).as("sy"),
      sum((col("xq").cast(dec) * col("yq").cast(dec))).as("sxy"),
      sum((col("xq").cast(dec) * col("xq").cast(dec))).as("sxx"),
      max(col("cnt")).as("top1_count"))
    agg.select(col("source"), col("n").cast(LongType).as("n_points"),
      col("top1_count"),
      round((col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType) /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType), 6)
        .as("zipf_slope"))
  }

  lazy val qZipfSql: String = {
    val h = hash60Sql("tok")
    s"""WITH c AS (SELECT source, tok, count(*) AS cnt
       |  FROM (SELECT source, unnest($toksSql) AS tok FROM documents)
       |  GROUP BY 1, 2),
       |r AS (SELECT source, cnt, row_number() OVER (PARTITION BY source
       |    ORDER BY cnt DESC, $h ASC) AS rank FROM c),
       |p AS (SELECT source, rank, cnt,
       |    cast(round(ln(cast(rank as double)) * 1000000000.0) as bigint) AS xq,
       |    cast(round(ln(cast(cnt as double)) * 1000000000.0) as bigint) AS yq
       |  FROM r WHERE rank <= 64),
       |a AS (SELECT source, cast(count(*) as hugeint) AS n,
       |    sum(cast(xq as hugeint)) AS sx,
       |    sum(cast(yq as hugeint)) AS sy,
       |    sum(cast(xq as hugeint) * yq) AS sxy,
       |    sum(cast(xq as hugeint) * xq) AS sxx,
       |    max(cnt) AS top1_count
       |  FROM p GROUP BY 1)
       |SELECT source, cast(n as bigint) AS n_points,
       |  cast(top1_count as bigint) AS top1_count,
       |  round(cast(n * sxy - sx * sy as double) /
       |        cast(n * sxx - sx * sx as double), 6) AS zipf_slope
       |FROM a""".stripMargin
  }

  /** Unicode-normalized fingerprinting
    * (graft.functions.UnicodeNorm — native NFC kernel): every doc
    * spawns a composed-form and a decomposed-form variant (é vs
    * e + U+0301), byte-level fingerprints see 2 distinct spellings,
    * NFC fingerprints collapse them to 1 — the dedup-evasion fix,
    * hash-gated against DuckDB's nfc_normalize over the whole corpus
    * (every document's text flows through both md5 paths).
    */
  def qNfcDedup(s: SparkSession, d: String): DataFrame = {
    import graft.functions.UnicodeNorm.unicode_normalize
    val docs = Tables.documents(s, d)
    val composed = docs.select((col("doc_id") * 2).as("id"),
      concat(col("text"), lit(" café résumé")).as("t"))
    val decomposed = docs.select((col("doc_id") * 2 + 1).as("id"),
      concat(col("text"), lit(" café résumé")).as("t"))
    composed.union(decomposed)
      .select(col("id"), col("t"), md5(col("t")).as("raw_fp"),
        md5(unicode_normalize(col("t"), "NFC")).as("nfc_fp"))
      .groupBy(col("nfc_fp"))
      .agg(min(col("id")).as("owner_id"),
        count(lit(1)).as("n_variants"),
        countDistinct(col("raw_fp")).as("n_raw_fps"))
  }

  lazy val qNfcDedupSql: String = {
    val comp = "' caf' || chr(233) || ' r' || chr(233) || 'sum' || chr(233)"
    val decomp =
      "' cafe' || chr(769) || ' re' || chr(769) || 'sume' || chr(769)"
    s"""WITH v AS (
       |  SELECT doc_id * 2 AS id, text || $comp AS t FROM documents
       |  UNION ALL
       |  SELECT doc_id * 2 + 1 AS id, text || $decomp AS t FROM documents)
       |SELECT md5(nfc_normalize(t)) AS nfc_fp, min(id) AS owner_id,
       |  count(*) AS n_variants, count(distinct md5(t)) AS n_raw_fps
       |FROM v GROUP BY 1""".stripMargin
  }

  /** Per-source DATA CARD — the one-row-per-source summary a dataset
    * release publishes, composed from this engine's already-verified
    * operators: volume (docs, tokens), lexical diversity (bigram
    * TTR), vocabulary health (Zipf slope), duplication (clusters +
    * SoftDedup kept fraction), decimal-exact mean quality, and the
    * dominant language with its share. Pure composition — every
    * column's math is the oracle-verified operator it came from, and
    * the oracle composes those queries' full replays (including
    * SoftDedup's recursive CC) as CTEs.
    */
  def qDataCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val div = qDiversity(s, d)
      .select(col("source"), col("n_docs"), col("n_tokens"), col("ttr2"))
    val zp = qZipf(s, d).select(col("source"), col("zipf_slope"))
    val sd = qSoftDedup(s, d)
      .select(col("source"), col("n_clusters"), col("kept_frac"))
    val qq = docs.groupBy(col("source"))
      .agg(round(sum(TextAnalysis.qualityScore(col("text"))
        .cast(DecimalType(18, 6))).cast(DoubleType) / count(lit(1)), 6)
        .as("mean_quality"))
    val lc = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("c").desc, col("lang").asc)
    val lt = lc.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"), col("c"))
    div.join(zp, Seq("source")).join(sd, Seq("source"))
      .join(qq, Seq("source")).join(lt, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("ttr2"),
        col("zipf_slope"), col("n_clusters"), col("kept_frac"),
        col("mean_quality"), col("top_lang"),
        round(col("c").cast(DoubleType) /
          col("n_docs").cast(DoubleType), 6).as("top_lang_share"))
  }

  lazy val qDataCardSql: String =
    s"""WITH dv AS (
       |$qDiversitySql),
       |zp AS (
       |$qZipfSql),
       |sd AS (
       |$qSoftDedupSql),
       |tq AS (SELECT source, text, $toksSql AS toks FROM documents),
       |qq AS (SELECT source,
       |    round(cast(sum(cast(${qualityExprSql("toks", "text")}
       |      as decimal(18,6))) as double) / count(*), 6) AS mean_quality
       |  FROM tq GROUP BY 1),
       |lc AS (SELECT source, lang, count(*) AS c FROM documents
       |  GROUP BY 1, 2),
       |lt AS (SELECT source, lang AS top_lang, c FROM (
       |  SELECT source, lang, c, row_number() OVER (PARTITION BY source
       |    ORDER BY c DESC, lang ASC) AS rn FROM lc) WHERE rn = 1)
       |SELECT dv.source, dv.n_docs, dv.n_tokens, dv.ttr2,
       |  zp.zipf_slope, sd.n_clusters, sd.kept_frac, qq.mean_quality,
       |  lt.top_lang,
       |  round(cast(lt.c as double) / cast(dv.n_docs as double), 6)
       |    AS top_lang_share
       |FROM dv JOIN zp USING (source) JOIN sd USING (source)
       |        JOIN qq USING (source) JOIN lt USING (source)""".stripMargin

  /** Mutual-kNN semantic clusters: reciprocal-nearest-neighbor
    * filtering (keep edge (a,b) only when a lists b AND b lists a —
    * the standard asymmetry filter that kills hub edges, used by
    * image/embedding dedup stacks) over the NN-Descent graph, then
    * connected components → cluster census. Scale shape: the mutual
    * join is an equi-join of the k-edge-per-node graph with itself
    * (≤ Nk rows a side), CC runs pointer-jumping on the filtered
    * edge list (O(log d) rounds), and the census is
    * component-keyed. The oracle replays the graph trajectory, the
    * reciprocity join, and the transitive closure.
    */
  def qMutualKnn(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.embeddings(s, d).filter(col("vec_id") % 4 === 0)
    // served from the persisted k-NN graph store (bit-equal to the
    // fresh build — see knnGraphServe): the reciprocity join + CC are
    // this query's own work; the descent is paid once per corpus
    // version across the whole suite, not once per consumer
    val g = knnGraphServe(s, d).select(col("src"), col("dst"))
    val mutual = g.as("a").join(g.as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
      .filter(col("a.src") < col("a.dst"))
      .select(col("a.src").as("src"), col("a.dst").as("dst"))
    val comps = graft.ops.ConnectedComponents.run(
      nodes.select(col("vec_id").as("id")), mutual)
    comps.groupBy(col("component").as("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
  }

  lazy val qMutualKnnSql: String =
    s"""WITH RECURSIVE $knnGraphCtesSql,
       |mu AS (SELECT a.src AS src, a.dst AS dst FROM g2 a JOIN g2 b
       |  ON a.src = b.dst AND a.dst = b.src WHERE a.src < a.dst),
       |sym AS (SELECT src, dst FROM mu UNION SELECT dst, src FROM mu),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM sym
       |  UNION
       |  SELECT r.src, s.dst FROM reach r JOIN sym s ON s.src = r.dst),
       |comp AS (SELECT src AS id, least(src, min(dst)) AS component
       |  FROM reach GROUP BY src),
       |allc AS (SELECT n.id, coalesce(c.component, n.id) AS component
       |  FROM n LEFT JOIN comp c ON c.id = n.id)
       |SELECT component AS cluster_id, count(*) AS n_members
       |FROM allc GROUP BY 1""".stripMargin

  /** k-NN graph served FROM the persisted src-bucketed store: the
    * graph is built once (NN-Descent), persisted bucketed by src with
    * the corpus-fingerprint staleness guard
    * (graft.dedup.IncrementalDedup discipline — the BUILD is a
    * by-name thunk, so a fresh store costs one fingerprint scan and
    * zero graph work), and "neighbors of these nodes" probes read
    * pre-hashed buckets — the serve path semantic dedup and
    * hard-negative mining hit many times per training run without
    * re-descending. Same oracle fragment as q_knn_graph BY DESIGN
    * (filtered to the probe set): the served rows must reproduce the
    * in-query graph bit-for-bit.
    */
  /** Ensure-and-read of the session's persisted k-NN graph store —
    * the SHARED serve path: q_knn_persisted, q_mutual_knn and
    * q_knn_recall's refined side all read this table, so a suite pays
    * ONE NN-Descent build (amortized behind the corpus-fingerprint
    * staleness guard) instead of one per consumer; q_knn_graph keeps
    * the fresh in-query build as the descent's own measurement. The
    * store's rows are bit-equal to the fresh build by construction
    * (same build thunk), which q_knn_persisted's oracle — the
    * q_knn_graph fragment filtered to the probe set — hash-verifies.
    */
  private def knnGraphServe(s: SparkSession, d: String): DataFrame = {
    val nodes = Tables.embeddings(s, d).filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding"))
    val table = "graft_knn_graph_" + d.replaceAll("[^A-Za-z0-9]", "_")
    graft.dedup.IncrementalDedup.ensureBucketedState(
      nodes.select(col("vec_id"),
        col("embedding").cast(StringType).as("sig")),
      "vec_id", "sig", table, nBuckets = 8,
      bucketCols = Seq("src"), sortCols = Seq("src"))(
      graft.sim.KnnGraph.build(nodes, "vec_id", "embedding",
        k = 3, rounds = 2, numPlanes = 4))
    s.table(table)
  }

  def qKnnPersisted(s: SparkSession, d: String): DataFrame =
    knnGraphServe(s, d).filter(col("src") % 20 === 0)

  lazy val qKnnPersistedSql: String =
    s"""WITH $knnGraphCtesSql
       |SELECT src, dst, round(sim, 6) AS sim, rank FROM (
       |  SELECT src, dst, sim, row_number() OVER (PARTITION BY src
       |    ORDER BY sim DESC, dst ASC) AS rank FROM s2)
       |WHERE rank <= 3 AND src % 20 = 0""".stripMargin

  /** name → (query, optional oracle) */
  val entries: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] = Seq(
    ("q_knn_graph", qKnnGraph _, Some(qKnnGraphSql)),
    ("q_curriculum", qCurriculum _, Some(qCurriculumSql)),
    ("q_weighted_k", qWeightedK _, Some(qWeightedKSql)),
    ("q_soft_dedup", qSoftDedup _, Some(qSoftDedupSql)),
    ("q_sem_decontam", qSemDecontam _, Some(qSemDecontamSql)),
    ("q_knn_recall", qKnnRecall _, Some(qKnnRecallSql)),
    ("q_diversity", qDiversity _, Some(qDiversitySql)),
    ("q_zipf", qZipf _, Some(qZipfSql)),
    ("q_nfc_dedup", qNfcDedup _, Some(qNfcDedupSql)),
    ("q_data_card", qDataCard _, Some(qDataCardSql)),
    ("q_mutual_knn", qMutualKnn _, Some(qMutualKnnSql)),
    ("q_knn_persisted", qKnnPersisted _, Some(qKnnPersistedSql)),
    ("q_bitext_margin", qBitextMargin _, Some(qBitextMarginSql)),
    ("q_url_canon", qUrlCanon _, Some(qUrlCanonSql)),
    ("q_kn_bigram", qKnBigram _, Some(qKnBigramSql)),
    ("q_curation_v5", qCurationV5 _, Some(qCurationV5Sql)),
    ("q_curation_v6", qCurationV6 _, Some(qCurationV6Sql)),
    ("q_decontam", qDecontam _, Some(qDecontamSql)),
    ("q_decontam_items", qDecontamItems _, Some(qDecontamItemsSql)),
    ("q_pack_global", qPackGlobal _, Some(qPackGlobalSql)),
    ("q_ewma", qEwma _, Some(qEwmaSql)),
    ("q_ann_recall", qAnnRecall _, Some(qAnnRecallSql)),
    ("q_phrase_glue", qPhraseGlue _, Some(qPhraseGlueSql)),
    ("q_hll_rollup", qHllRollup _, Some(qHllRollupSql)),
    ("q_kmv_rollup", qKmvRollup _, Some(qKmvRollupSql)),
    ("q_containment", qContainment _, Some(qContainmentSql)),
    ("q_rank_transform", qRankTransform _, Some(qRankTransformSql)),
    ("q_char_entropy", qCharEntropy _, Some(qCharEntropySql)),
    ("q_pmi_phrases", qPmiPhrases _, Some(qPmiPhrasesSql)),
    ("q_snm_pairs", qSnmPairs _, Some(qSnmPairsSql)),
    ("q_ppl_bands", qPplBands _, Some(qPplBandsSql)),
    ("q_token_count", qTokenCount _, Some(qTokenCountSql)),
    ("q_bigrams", qBigrams _, Some(qBigramsSql)),
    ("q_tokenize", qTokenize _, Some(qTokenizeSql)),
    ("q_text_quality", qTextQuality _, Some(qTextQualitySql)),
    ("q_classifier", qClassifier _, Some(qClassifierSql)),
    ("q_calibration", qCalibration _, Some(qCalibrationSql)),
    ("q_url_profile", qUrlProfile _, Some(qUrlProfileSql)),
    ("q_lang_id", qLangId _, Some(qLangIdSql)),
    ("q_fingerprint", qFingerprint _, Some(qFingerprintSql)),
    ("q_pii_redact", qPiiRedact _, Some(qPiiRedactSql)),
    ("q_cms_tokens", qCmsTokens _, Some(qCmsTokensSql)),
    ("q_cms_grouped", qCmsGrouped _, Some(qCmsGroupedSql)),
    ("q_split_assign", qSplitAssign _, Some(qSplitAssignSql)),
    ("q_strat_sample", qStratSample _, Some(qStratSampleSql)),
    ("q_group_sample", qGroupSample _, Some(qGroupSampleSql)),
    ("q_token_budget", qTokenBudget _, Some(qTokenBudgetSql)),
    ("q_repetition", qRepetition _, Some(qRepetitionSql)),
    ("q_span_dedup", qSpanDedup _, Some(qSpanDedupSql)),
    ("q_span_scrub", qSpanScrub _, Some(qSpanScrubSql)),
    ("q_para_dedup", qParaDedup _, Some(qParaDedupSql)),
    ("q_substr_dedup", qSubstrDedup _, Some(qSubstrDedupSql)),
    ("q_substr_spans", qSubstrSpans _, Some(qSubstrSpansSql)),
    ("q_winnow", qWinnow _, Some(qWinnowSql)),
    ("q_winnow_pairs", qWinnowPairs _, Some(qWinnowPairsSql)),
    ("q_unigram_lm", qUnigramLm _, Some(qUnigramLmSql)),
    ("q_dsir", qDsir _, Some(qDsirSql)),
    ("q_mix_opt", qMixOpt _, Some(qMixOptSql)),
    ("q_token_drift", qTokenDrift _, Some(qTokenDriftSql)),
    ("q_mix_pipeline", qMixPipeline _, Some(qMixPipelineSql)),
    ("q_bigram_lm", qBigramLm _, Some(qBigramLmSql)),
    ("q_weighted_sample", qWeightedSample _, Some(qWeightedSampleSql)),
    ("q_quality_gate", qQualityGate _, Some(qQualityGateSql)),
    ("q_group_gate", qGroupGate _, Some(qGroupGateSql)),
    ("q_seq_pack", qSeqPack _, Some(qSeqPackSql)),
    ("q_chunk_split", qChunkSplit _, Some(qChunkSplitSql)),
    ("q_epoch_mix", qEpochMix _, Some(qEpochMixSql)),
    ("q_quantile_hist", qQuantileHist _, Some(qQuantileHistSql)),
    ("q_winsorize", qWinsorize _, Some(qWinsorizeSql)),
    ("q_contam", qContam _, Some(qContamSql)),
    ("q_domain_mix", qDomainMix _, Some(qDomainMixSql)),
    ("q_temp_mix", qTempMix _, Some(qTempMixSql)),
    ("q_corpus_profile", qCorpusProfile _, Some(qCorpusProfileSql)),
    ("q_corpus_pipeline", qCorpusPipeline _, Some(qCorpusPipelineSql)),
    ("q_curation_v2", qCurationV2 _, Some(qCurationV2Sql)),
    ("q_curation_v3", qCurationV3 _, Some(qCurationV3Sql)),
    ("q_curation_v4", qCurationV4 _, Some(qCurationV4Sql)),
    ("q_dedup_exact", qDedupExact _, Some(qDedupExactSql)),
    ("q_incr_dedup", qIncrDedup _, Some(qIncrDedupSql)),
    ("q_incr_near", qIncrNear _, Some(qIncrNearSql)),
    ("q_minhash_sig", qMinhashSig _, Some(qMinhashSigSql)),
    ("q_minhash_pairs", qMinhashPairs _, Some(qMinhashPairsSql)),
    ("q_dedup_apply", qDedupApply _, Some(qDedupApplySql)),
    ("q_dup_clusters", qDupClusters _, Some(qDupClustersSql)),
    ("q_dedup_best", qDedupBest _, Some(qDedupBestSql)),
    ("q_survivor", qSurvivor _, Some(qSurvivorSql)),
    ("q_kanon", qKanon _, Some(qKanonSql)),
    ("q_join_card", qJoinCard _, Some(qJoinCardSql)),
    ("q_pareto", qPareto _, Some(qParetoSql)),
    ("q_dedup_incr", qDedupIncr _, Some(qDedupIncrSql)),
    ("q_simhash", qSimhash _, Some(qSimhashSql)),
    ("q_simhash_pairs", qSimhashPairs _, Some(qSimhashPairsSql)),
    ("q_ngram_jaccard", qNgramJaccard _, Some(qNgramJaccardSql)),
    ("q_allpairs", qAllPairs _, Some(qAllPairsSql)),
    ("q_tfidf_pairs", qTfidfPairs _, Some(qTfidfPairsSql)),
    ("q_dim_stats", qDimStats _, Some(qDimStatsSql)),
    ("q_ann_topk", qAnnTopK _, Some(qAnnTopKSql)),
    ("q_ann_lsh", qAnnLsh _, Some(qAnnLshSql)),
    ("q_ann_multiprobe", qAnnMultiprobe _, Some(qAnnMultiprobeSql)),
    ("q_ann_ivf", qAnnIvf _, Some(qAnnIvfSql)),
    ("q_embed_dup", qEmbedDup _, Some(qEmbedDupSql)),
    ("q_kmeans", qKmeans _, Some(qKmeansSql)),
    ("q_ivf_append", qIvfAppend _, Some(qIvfAppendSql)),
    ("q_pq_encode", qPqEncode _, Some(qPqEncodeSql)),
    ("q_pq_adc", qPqAdc _, Some(qPqAdcSql)),
    ("q_pq_ivf", qPqIvf _, Some(qPqIvfSql)),
    // identical oracle to q_pq_ivf BY DESIGN: the persisted index must
    // serve the exact ranking the in-query path computes
    ("q_ann_persisted", qAnnPersisted _, Some(qPqIvfSql)),
    ("q_pq_residual", qPqResidual _, Some(qPqResidualSql)),
    ("q_sq8_encode", qSq8Encode _, Some(qSq8EncodeSql)),
    ("q_sq8_topk", qSq8TopK _, Some(qSq8TopKSql)),
    ("q_mmr", qMmr _, Some(qMmrSql)),
    ("q_ann_rerank", qAnnRerank _, Some(qAnnRerankSql)),
    ("q_semdedup", qSemdedup _, Some(qSemdedupSql)),
    ("q_pagerank", qPagerank _, Some(qPagerankSql)),
    ("q_label_prop", qLabelProp _, Some(qLabelPropSql)),
    ("q_kcore", qKcore _, Some(qKcoreSql)),
    ("q_modularity", qModularity _, Some(qModularitySql)),
    ("q_sssp", qSssp _, Some(qSsspSql)),
    ("q_trustrank", qTrustrank _, Some(qTrustrankSql)),
    // identical oracle to q_sssp BY DESIGN: the persisted-adjacency
    // probe must serve the exact distances the in-query BFS computes
    ("q_sssp_persisted", qSsspPersisted _, Some(qSsspSql)),
    ("q_assoc", qAssoc _, Some(qAssocSql)),
    ("q_item_cf", qItemCf _, Some(qItemCfSql)),
    ("q_cuped", qCuped _, Some(qCupedSql)),
    ("q_ivm_join", qIvmJoin _, Some(qIvmJoinSql)),
    ("q_kmv_intersect", qKmvIntersect _, Some(qKmvIntersectSql)),
    ("q_phrase_search", qPhraseSearch _, Some(qPhraseSearchSql)),
    // identical oracle to q_phrase_search BY DESIGN: the persisted
    // positional index must serve the same occurrences
    ("q_phrase_persisted", qPhrasePersisted _, Some(qPhraseSearchSql)),
    ("q_attribution", qAttribution _, Some(qAttributionSql)),
    ("q_keywords", qKeywords _, Some(qKeywordsSql)),
    ("q_markov", qMarkov _, Some(qMarkovSql)),
    ("q_hll_intersect", qHllIntersect _, Some(qHllIntersectSql)),
    ("q_kmv_store", qKmvStore _, Some(qKmvStoreSql)),
    ("q_qhist_store", qQhistStore _, Some(qQhistStoreSql)),
    ("q_journeys", qJourneys _, Some(qJourneysSql)),
    ("q_cohort_ltv", qCohortLtv _, Some(qCohortLtvSql)),
    ("q_hard_negatives", qHardNegatives _, Some(qHardNegativesSql)),
    ("q_embed_norm", qEmbedNorm _, Some(qEmbedNormSql)),
    ("q_cluster_purity", qClusterPurity _, Some(qClusterPuritySql)),
    ("q_ks_test", qKsTest _, Some(qKsTestSql)),
    ("q_minhash_recall", qMinhashRecall _, Some(qMinhashRecallSql)),
    ("q_power", qPower _, Some(qPowerSql)),
    ("q_mutual_info", qMutualInfo _, Some(qMutualInfoSql)),
    ("q_feature_hash", qFeatureHash _, Some(qFeatureHashSql)),
    ("q_qte", qQte _, Some(qQteSql)),
    ("q_hhi", qHhi _, Some(qHhiSql)),
    ("q_triangles", qTriangles _, Some(qTrianglesSql)),
    ("q_fuzzy_join", qFuzzyJoin _, Some(qFuzzyJoinSql)),
    ("q_snapshot_diff", qSnapshotDiff _, Some(qSnapshotDiffSql)),
    ("q_drift", qDrift _, Some(qDriftSql)),
    ("q_topk_group", qTopkGroup _, Some(qTopkGroupSql)),
    ("q_salted_join", qSaltedJoin _, Some(qSaltedJoinSql)),
    ("q_leak_split", qLeakSplit _, Some(qLeakSplitSql)),
    ("q_neg_sample", qNegSample _, Some(qNegSampleSql)),
    ("q_shuffle_shards", qShuffleShards _, Some(qShuffleShardsSql)),
    ("q_dense_ids", qDenseIds _, Some(qDenseIdsSql)),
    ("q_rendezvous", qRendezvous _, Some(qRendezvousSql)),
    ("q_cdc_upsert", qCdcUpsert _, Some(qCdcUpsertSql)),
    ("q_bpe", qBpe _, Some(qBpeSql)),
    ("q_bpe_encode", qBpeEncode _, Some(qBpeEncodeSql)),
    ("q_bm25", qBm25 _, Some(qBm25Sql)),
    ("q_bm25_persisted", qBm25Persisted _, Some(qBm25Sql)),
    ("q_ann_rp", qAnnRp _, Some(qAnnRpSql)),
    ("q_rrf", qRrf _, Some(qRrfSql)),
    ("q_phash", qPhash _, Some(qPhashSql)),
    ("q_binary_meta", qBinaryMeta _, Some(qBinaryMetaSql)),
    ("q_media_features", qMediaFeatures _, Some(qMediaFeaturesSql)),
    ("q_media_resize", qMediaResize _, Some(qMediaResizeSql)),
    ("q_frame_sample", qFrameSample _, Some(qFrameSampleSql)))
}
