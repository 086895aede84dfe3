package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BM25 ranked retrieval (Robertson & Zaragoza 2009, the Lucene
  * `k1/b` variant with the +1-shifted idf that never goes negative) —
  * keyword search over the corpus, the lexical complement to the
  * embedding ANN family. Retrieval-augmented pipelines use exactly
  * this pair: BM25 candidates ∪ vector candidates → rerank.
  *
  * Determinism: each (query term, document) contribution
  * idf(t)·tfnorm(t,d) is computed ONCE from exact integer statistics
  * (tf, df, dl, N, total-token count) through an identical expression
  * shape in both engines, then QUANTIZED to an integer; per-(query,
  * doc) scores are exact integer sums — float addition order never
  * matters ([[UnigramLm]]'s discipline).
  *
  * Scale shape: tokenize once into a persisted (doc, term) stream;
  * tf, dl, and df are partial-aggregated shuffles of that stream; N
  * and avgdl ride a 1-row broadcast; the query-term table (|queries| ·
  * terms rows — tiny) broadcasts into the tf join, so candidate
  * generation touches only postings of queried terms, never the whole
  * corpus crossed with queries. Ranking is a per-query top-k window
  * over candidates.
  */
object Bm25 {

  /** Quantization step for the exact integer score accumulation. */
  val Scale = 1000000L

  /** Top-`k` documents per query: (query_id, doc_id-named idCol,
    * score, rank). `queries` must have (query_id, qtext); duplicate
    * query terms count once (the standard bag-of-distinct-terms form).
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, k: Int = 10, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(docs)
        .select(col(idCol).as("id"),
          explode(TextAnalysis.tokens(col(textCol))).as("tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val tf = toks.groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("n_toks"))
    val qterms = queries.select(col("query_id"),
      explode(array_distinct(TextAnalysis.tokens(col("qtext")))).as("tok"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nD = col("n_docs").cast(DoubleType)
    val avgdl = col("n_toks").cast(DoubleType) / nD
    val idf = log((nD - col("df").cast(DoubleType) + 0.5) /
      (col("df").cast(DoubleType) + 0.5) + 1.0)
    val tfd = col("tf").cast(DoubleType)
    val tfn = tfd * lit(k1 + 1.0) /
      (tfd + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast(DoubleType) / avgdl))
    val contribs = broadcast(qterms).join(tf, Seq("tok"))
      .join(dfreq, Seq("tok"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("id"),
        round(idf * tfn * Scale).cast(LongType).as("c"))
    val scores = contribs.groupBy(col("query_id"), col("id"))
      .agg(sum(col("c")).as("sc"))
    import org.apache.spark.sql.expressions.Window
    scores
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("sc").desc, col("id").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as(idCol),
        round(col("sc").cast(DoubleType) / Scale, 6).as("score"), col("rank"))
  }
}
