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

  /** Top-`k` docs per query served FROM the persisted index — same
    * output contract (and bit-identical scores) as [[Bm25.topK]].
    */
  def topK(spark: SparkSession, table: String, queries: DataFrame,
      idCol: String, k: Int = 10, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
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
    val contribs = broadcast(qterms).join(postings, Seq("tok"))
      .select(col("query_id"), col("id"),
        round(idf * tfn * Bm25.Scale).cast(LongType).as("c"))
    val scores = contribs.groupBy(col("query_id"), col("id"))
      .agg(sum(col("c")).as("sc"))
    import org.apache.spark.sql.expressions.Window
    scores
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("sc").desc, col("id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as(idCol),
        round(col("sc").cast(DoubleType) / Bm25.Scale, 6).as("score"),
        col("rank"))
  }
}
