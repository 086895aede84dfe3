package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Self-trained unigram language-model scoring — the perplexity-proxy
  * quality filter of a CCNet-style curation pipeline, with the corpus
  * itself as the training set (no external model artifact): documents
  * whose tokens are atypical for the corpus score low (very negative
  * mean log-probability) and are filter candidates; boilerplate made of
  * ubiquitous tokens scores high.
  *
  * Determinism: each vocabulary token's log-probability is computed
  * once (ln(count/total), a single libm call on an exact rational) and
  * QUANTIZED to an integer (round(lp·1e6) as long); per-document
  * scores are then exact integer sums divided at the end — no
  * order-dependent float accumulation anywhere, so the score replays
  * exactly in any engine. Long bounds: |lp| ≤ ~40 nats scaled to 4e7,
  * safe for documents up to ~2×10¹¹ tokens.
  *
  * Scale shape: one partial-aggregated shuffle for token counts (heavy
  * hitters collapse map-side), a 1-row broadcast for the total, one
  * equi-join of the token stream against the vocabulary (AQE
  * broadcasts it when it fits — natural-language vocabularies do), and
  * one per-doc aggregation. Nothing holds unbounded state.
  */
object UnigramLm {

  /** Quantization step for the exact integer score accumulation. */
  val Scale = 1000000L

  /** Per-document mean token log-probability (nats, rounded to 1e-6):
    * (idCol, n_tokens, avg_logp). Token-less documents survive with
    * n_tokens = 0 and avg_logp = 0.0.
    */
  def score(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(df)
        .select(col(idCol).as("id"),
          explode(TextAnalysis.tokens(col(textCol))).as("tok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c")).as("tt"))
    val logp = vocab.crossJoin(broadcast(total))
      .select(col("tok"),
        round(log(col("c").cast(DoubleType) / col("tt").cast(DoubleType)) * Scale)
          .cast(LongType).as("lp"))
    val perDoc = toks.join(logp, Seq("tok"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lp")).as("slp"))
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(when(col("n_tokens") > 0,
          col("slp").cast(DoubleType) / col("n_tokens") / Scale)
          .otherwise(0.0), 6).as("avg_logp"))
  }
}
