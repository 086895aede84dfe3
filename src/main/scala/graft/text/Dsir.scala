package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data Selection with Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely
  * its hashed n-gram features are under a TARGET distribution than
  * under the raw-corpus distribution. High-scoring documents "look
  * like" the target domain; the selection step is then just existing
  * machinery (take the top fraction by weight — e.g.
  * [[graft.sketch.QuantileHist.topFraction]] — or feed the weight into
  * [[graft.ops.Sampling]]'s deterministic weighted draw).
  *
  * Features are unigrams AND bigrams hashed into `numBuckets` buckets
  * (the paper's hashed generative model): bucketing bounds both LM
  * states at `numBuckets` rows regardless of corpus size, and the
  * Laplace-smoothed bucket LMs make the weight of an unseen feature
  * well-defined.
  *
  * Determinism: the per-bucket log ratio
  * ln((ct+1)/(Tt+B)) − ln((cr+1)/(Tr+B)) is computed once per bucket
  * from exact integer counts and QUANTIZED to an integer
  * (round(·1e6)); per-document weights are exact integer sums — the
  * same replay-exactly discipline as [[UnigramLm]].
  *
  * Scale shape: one partial-aggregated shuffle of the feature stream
  * keyed by bucket (both LMs come out of the SAME aggregation — the
  * target count is a conditional sum, not a second pass), a 1-row
  * broadcast of the totals, one equi-join of the stream against the
  * ≤`numBuckets`-row weight table (AQE broadcasts it), one per-doc
  * aggregation. Nothing holds state proportional to the corpus.
  */
object Dsir {

  /** Quantization step for the exact integer weight accumulation. */
  val Scale = 1000000L

  /** Hashed unigram+bigram bucket ids of the token array (with
    * multiplicity — the generative model counts occurrences).
    */
  private def featureBuckets(toks: Column, b: Int): Column = {
    val uni = transform(toks, t => TextAnalysis.hash60(t) % b)
    val bi = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => TextAnalysis.hash60(
          concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))) % b))
      .otherwise(array().cast(ArrayType(LongType)))
    concat(uni, bi)
  }

  /** Per-document importance weight: (idCol, n_feats, logw) where
    * `logw` is the summed quantized log-ratio of the document's hashed
    * features (rounded to 1e-6). Feature-less documents survive with
    * n_feats = 0 and logw = 0.0. `isTarget` marks the rows that define
    * the target distribution (they are scored too — DSIR scores the
    * whole raw corpus, which includes the target sample).
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, numBuckets: Int = 4096): DataFrame = {
    val feats = graft.CacheRegistry.register(
      graft.ops.Parallelism.widen(df)
        .select(col(idCol).as("id"), isTarget.as("tgt"),
          explode(featureBuckets(TextAnalysis.tokens(col(textCol)), numBuckets))
            .as("f"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // both LMs from ONE aggregation: raw count + conditional target count
    val counts = feats.groupBy(col("f"))
      .agg(count(lit(1)).as("cr"),
        sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"))
    val totals = counts.agg(sum(col("cr")).as("tr"), sum(col("ct")).as("tt"))
    val b = numBuckets.toDouble
    val weights = counts.crossJoin(broadcast(totals))
      .select(col("f"),
        round((log((col("ct").cast(DoubleType) + 1.0) /
                   (col("tt").cast(DoubleType) + b)) -
               log((col("cr").cast(DoubleType) + 1.0) /
                   (col("tr").cast(DoubleType) + b))) * Scale)
          .cast(LongType).as("lr"))
    val perDoc = feats.join(weights, Seq("f"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lr")).as("slr"))
    df.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        round(coalesce(col("slr").cast(DoubleType) / Scale, lit(0.0)), 6)
          .as("logw"))
  }
}
