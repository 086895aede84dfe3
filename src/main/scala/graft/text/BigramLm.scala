package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Self-trained bigram language-model scoring — the conditional
  * (order-2) sibling of [[UnigramLm]]: each document is scored by the
  * mean log of p(w₂|w₁) = c(w₁w₂)/c(w₁·) over its adjacent token
  * pairs, where c(w₁·) counts w₁ as a bigram LEFT (so the
  * probabilities per left-token sum to exactly 1 and no smoothing
  * constant is needed). Repetitive boilerplate (high-probability
  * transitions) scores near 0; incoherent token salad scores very
  * negative — a sharper fluency signal than unigram frequency, which
  * cannot see word ORDER at all.
  *
  * Determinism (the [[UnigramLm]] contract): each distinct bigram's
  * log-probability is one libm call on an exact rational, QUANTIZED to
  * an integer (round(lp·1e6) as long); per-document scores are exact
  * integer sums divided once at the end — no order-dependent float
  * accumulation, so the score replays exactly in any engine.
  *
  * Scale shape: the bigram stream is a narrow map (size-1 pairs per
  * doc); bigram and left-token counts are partial-aggregated shuffles
  * (heavy hitters collapse map-side); the log-prob table joins back by
  * bigram key (AQE broadcasts natural-language bigram vocabularies
  * when they fit); one per-doc aggregation. Nothing holds unbounded
  * state. Documents with fewer than 2 tokens survive with
  * n_bigrams = 0 and avg_logp = 0.0.
  */
object BigramLm {

  /** Quantization step for the exact integer score accumulation. */
  val Scale = 1000000L

  /** Absolute discount for [[scoreKneserNey]] — the standard 0.75
    * (exactly representable in binary, so the discounted numerators
    * are deterministic doubles).
    */
  val Discount = 0.75

  /** "w1 w2" joined-string bigram keys — [[TextAnalysis.wordNgrams]]
    * at n = 2, single-sourced so a tokenizer or short-doc-guard change
    * cannot silently diverge between the LM family and the diversity
    * stats. Tokens are whitespace-free by construction, so the first
    * space splits the pair back losslessly.
    */
  private def bigramsOf(textCol: String) =
    TextAnalysis.wordNgrams(col(textCol), 2)

  /** Cached (id, bg) occurrence stream. */
  private def occurrences(df: DataFrame, idCol: String, textCol: String) =
    graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(df)
        .select(col(idCol).as("id"), explode(bigramsOf(textCol)).as("bg"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))

  /** Shared finalization of both scorers: exact integer per-doc sum
    * of the quantized per-bigram log-probs, one divide at the end,
    * 0-bigram docs survive with avg_logp = 0.0 — the quantization
    * contract lives HERE and nowhere else.
    */
  private def perDocAvg(bgs: DataFrame, logp: DataFrame, df: DataFrame,
      idCol: String): DataFrame = {
    val perDoc = bgs.join(logp, Seq("bg"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("slp"))
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(when(col("n_bigrams") > 0,
          col("slp").cast(DoubleType) / col("n_bigrams") / Scale)
          .otherwise(0.0), 6).as("avg_logp"))
  }

  /** Per-document mean bigram log-probability (nats, rounded to 1e-6):
    * (idCol, n_bigrams, avg_logp).
    */
  def score(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bgs = occurrences(df, idCol, textCol)
    val cb = bgs.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    // left-token counts derive from cb (sum of cb per left token), not
    // from a second corpus-sized scan of bgs: the distinct-bigram frame
    // is orders of magnitude smaller than the occurrence stream
    val cl = cb.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("cb")).as("cl"))
    val logp = cb
      .join(cl, substring_index(cb("bg"), " ", 1) === cl("w1"))
      .select(col("bg"),
        round(log(col("cb").cast(DoubleType) / col("cl").cast(DoubleType)) * Scale)
          .cast(LongType).as("lp"))
    perDocAvg(bgs, logp, df, idCol)
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney '95; Chen &
    * Goodman '98 formulation) — the smoothing every serious n-gram LM
    * uses instead of raw MLE:
    *
    *   p(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·)
    *            + (D·N₁₊(w₁·)/c(w₁·)) · N₁₊(·w₂)/N₁₊(··)
    *
    * The backoff weight redistributes exactly the discounted mass, and
    * the continuation probability N₁₊(·w₂)/N₁₊(··) scores how many
    * DISTINCT left contexts w₂ follows — "San Francisco" makes
    * "Francisco" frequent but not versatile, and KN is the standard
    * fix for exactly that artifact in MLE bigram scores. Per-w₁ the
    * full-vocabulary probabilities sum to exactly 1 (law pinned in
    * KneserNeySpec).
    *
    * All model quantities derive from the DISTINCT-BIGRAM frame (cb),
    * orders of magnitude smaller than the occurrence stream: one
    * grouped agg each for left counts+fanout and right fanout, one
    * 1-row agg for the distinct-bigram total (the idiomatic
    * scalar-subquery broadcast cross join). Quantization contract of
    * [[score]]: one libm log per distinct bigram on exact rationals,
    * integer per-doc sums.
    */
  def scoreKneserNey(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val bgs = occurrences(df, idCol, textCol)
    val cb = bgs.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    val left = cb.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("cb")).as("cl"), count(lit(1)).as("n1l"))
    val right = cb.groupBy(substring_index(col("bg"), " ", -1).as("w2"))
      .agg(count(lit(1)).as("n1r"))
    val tot = cb.agg(count(lit(1)).as("n1t")) // 1 row — bounded
    val p = greatest(col("cb").cast(DoubleType) - Discount, lit(0.0)) /
        col("cl").cast(DoubleType) +
      ((lit(Discount) * col("n1l").cast(DoubleType)) /
        col("cl").cast(DoubleType)) *
        (col("n1r").cast(DoubleType) / col("n1t").cast(DoubleType))
    val logp = cb
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(left, Seq("w1"))
      .join(right, Seq("w2"))
      .crossJoin(broadcast(tot))
      .select(col("bg"), round(log(p) * Scale).cast(LongType).as("lp"))
    perDocAvg(bgs, logp, df, idCol)
  }
}
