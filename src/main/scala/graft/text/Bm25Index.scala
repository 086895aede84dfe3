package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PERSISTED BM25 inverted index — the lexical-retrieval serving path
  * ([[graft.sim.AnnIndex]]'s sibling): [[Bm25.topK]] re-tokenizes and
  * re-aggregates the whole corpus per query batch, which is the right
  * shape for a one-off audit and the wrong one for serving. Here the
  * postings persist ONCE as a term-BUCKETED table and every query
  * batch probes them:
  *
  *  - postings row = (tok, df, id, tf, dl) — df denormalized onto the
  *    posting so scoring needs no second term-level join;
  *  - the corpus scalars (N docs, total tokens) ride as TABLE
  *    PROPERTIES → query-time LITERALS (driver-held model state, like
  *    the k-means centroids) — no 1-row broadcast at probe time;
  *  - staleness: the [[graft.dedup.IncrementalDedup]] corpus-checksum
  *    discipline (count + wrapping id⊕content hash sum in table
  *    properties; [[ensure]] rebuilds on any drift);
  *  - probe plan: the tiny query-term frame broadcasts into the
  *    postings scan (bucket-pruned to queried terms' buckets at
  *    best, never exchanged — spec-pinned with broadcast disabled);
  *    the only shuffle is the per-(query, doc) score aggregation,
  *    CANDIDATE-proportional, never corpus-proportional.
  *
  * Score parity: the probe reproduces [[Bm25.topK]]'s ranking
  * BIT-FOR-BIT (spec + oracle-pinned): idf/tf-norm use the identical
  * expression shapes with N and avgdl bound as literals — the same
  * doubles the in-query operator computes from its 1-row stats
  * broadcast, through the same quantized-integer sum.
  */
object Bm25Index {

  private val PropNDocs = "graft.bm25_ndocs"
  private val PropNToks = "graft.bm25_ntoks"

  /** The postings frame for `docs` (one row per (term, doc)). */
  def postingsOf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = graft.ops.Parallelism.widen(docs)
      .select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(dl, Seq("id")).join(dfreq, Seq("tok"))
      .select(col("tok"), col("df"), col("id"), col("tf"), col("dl"))
  }

  /** Persist (or reuse) the index for `docs` as bucketed table
    * `table`; returns true when a (re)build happened.
    */
  def ensure(docs: DataFrame, idCol: String, textCol: String,
      table: String, nBuckets: Int): Boolean = {
    val spark = docs.sparkSession
    val built = graft.dedup.IncrementalDedup.ensureBucketedState(
      docs, idCol, textCol, table, nBuckets,
      bucketCols = Seq("tok"), sortCols = Seq("tok"))(
      postingsOf(docs, idCol, textCol))
    if (built) {
      // corpus scalars, computed from the postings just written (one
      // doc-grain pass over the index, not the corpus)
      val r = spark.table(table)
        .groupBy(col("id")).agg(first(col("dl")).as("dl"))
        .agg(count(lit(1)), sum(col("dl"))).collect().head
      spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES(" +
        s"'$PropNDocs'='${r.getLong(0)}','$PropNToks'='${r.getLong(1)}')")
    }
    built
  }

  /** The per-(query, term, doc) quantized contribution frame off the
    * persisted postings — the shared probe both [[topK]] and
    * [[topKMaxScore]] rank from (one expression shape ⇒ bit-identical
    * scores). Contributions are non-negative by construction (the
    * +1-shifted idf is always positive, tf-norm is positive), which is
    * what makes [[topKMaxScore]]'s upper bounds sound.
    */
  private def probeContribs(spark: SparkSession, table: String,
      queries: DataFrame, k1: Double, b: Double): DataFrame = {
    val props = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val nDocs = props.getOrElse(PropNDocs,
      sys.error(s"$table carries no $PropNDocs — not a Bm25Index table"))
      .toLong
    val nToks = props(PropNToks).toLong
    val postings = spark.table(table)
    val qterms = queries.select(col("query_id"),
      explode(array_distinct(TextAnalysis.tokens(col("qtext")))).as("tok"))
    // LITERAL scalars: same doubles the in-query operator derives from
    // its 1-row stats broadcast (long→double conversion + division are
    // both exact-deterministic), so the expression values match
    val nD = lit(nDocs.toDouble)
    val avgdl = lit(nToks.toDouble / nDocs.toDouble)
    val idf = log((nD - col("df").cast(DoubleType) + 0.5) /
      (col("df").cast(DoubleType) + 0.5) + 1.0)
    val tfd = col("tf").cast(DoubleType)
    val tfn = tfd * lit(k1 + 1.0) /
      (tfd + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast(DoubleType) / avgdl))
    broadcast(qterms).join(postings, Seq("tok"))
      .select(col("query_id"), col("tok"), col("id"),
        round(idf * tfn * Bm25.Scale).cast(LongType).as("c"))
  }

  /** (sc desc, id asc) top-`k` ranking — the output contract shared
    * with [[Bm25.topK]].
    */
  private def rankTopK(scores: DataFrame, idCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scores
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("sc").desc, col("id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as(idCol),
        round(col("sc").cast(DoubleType) / Bm25.Scale, 6).as("score"),
        col("rank"))
  }

  /** Top-`k` docs per query served FROM the persisted index — same
    * output contract (and bit-identical scores) as [[Bm25.topK]].
    */
  def topK(spark: SparkSession, table: String, queries: DataFrame,
      idCol: String, k: Int = 10, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val contribs = probeContribs(spark, table, queries, k1, b)
      .select(col("query_id"), col("id"), col("c"))
    rankTopK(contribs.groupBy(col("query_id"), col("id"))
      .agg(sum(col("c")).as("sc")), idCol, k)
  }

  /** Top-`k` per query with MAXSCORE pruning (Turtle & Flood 1995) —
    * EXACT top-k (bit-identical ranking to [[topK]], ties included),
    * but only CANDIDATE documents ever enter the score-aggregation
    * shuffle. At corpus scale the full probe's dominant cost is
    * shuffling every (query, doc-with-any-query-term) contribution to
    * its reducer — a stop-word-ish query term drags the whole corpus
    * through the exchange to compute a top-10. MaxScore cuts exactly
    * that:
    *
    *  1. per-term upper bounds `U(t) = max c(t,·)` aggregate ON the
    *     term-bucketed postings scan (no exchange — bucketing on tok
    *     satisfies the (query, tok) clustering);
    *  2. a LOWER bound θ of the true kth score: the kth-best single
    *     contribution among the top-impact term's postings (full
    *     scores only exceed single contributions, so the kth full
    *     score ≥ this θ) — one bounded window over ONE term's
    *     postings, and the top-impact term is the highest-idf one,
    *     i.e. typically the RAREST postings list;
    *  3. terms sorted by ascending U: the maximal prefix whose
    *     running ΣU stays STRICTLY below θ is non-essential — a
    *     document containing only prefix terms scores ≤ that ΣU < θ ≤
    *     kth score, so it cannot enter the top-k even on tie-breaks
    *     (strictness is what keeps the (sc desc, id asc) tie contract
    *     exact);
    *  4. candidates = docs holding ≥1 essential term; only their
    *     contribution rows reach the aggregation (candidate set
    *     broadcast map-side into the probe — the bloom-pruned-join
    *     shape at sizes past broadcast);
    *  5. queries with fewer than k docs behind the seed term get no θ
    *     and degrade soundly to the unpruned probe.
    *
    * Everything per-query happens in one DataFrame plan — no driver
    * loop over queries, no per-query actions.
    */
  def topKMaxScore(spark: SparkSession, table: String, queries: DataFrame,
      idCol: String, k: Int = 10, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = graft.CacheRegistry.register(
      probeContribs(spark, table, queries, k1, b)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // (1) per-(query, term) upper bounds — no exchange on the bucketed scan
    val u = p.groupBy(col("query_id"), col("tok")).agg(max(col("c")).as("u"))
    // (2) θ from the single top-impact term's postings
    val tstar = u.withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("u").desc, col("tok").asc)))
      .filter(col("rn") === 1).select(col("query_id"), col("tok"))
    val theta = p.join(broadcast(tstar), Seq("query_id", "tok"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("c").desc, col("id").asc)))
      .filter(col("rn") === k)
      .select(col("query_id"), col("c").as("theta"))
    // (3) ascending-U running sum; essential ⇔ cum ≥ θ (strict <
    // keeps the prune sound under ties); no θ ⇒ everything essential
    val ess = u.join(broadcast(theta), Seq("query_id"), "left")
      .withColumn("cum", sum(col("u")).over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("u").asc, col("tok").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("theta").isNull || col("cum") >= col("theta"))
      .select(col("query_id"), col("tok"))
    // (4) candidate docs = ≥1 essential term; prune the probe
    // MAP-SIDE before the score exchange
    val cand = p.join(broadcast(ess), Seq("query_id", "tok"))
      .select(col("query_id"), col("id")).distinct()
    val scores = p.join(broadcast(cand), Seq("query_id", "id"))
      .groupBy(col("query_id"), col("id")).agg(sum(col("c")).as("sc"))
    rankTopK(scores, idCol, k)
  }
}
