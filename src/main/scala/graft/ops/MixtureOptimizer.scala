package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Domain-mixture optimizer — the DoReMi-style multiplicative-weights
  * reweighting a pretraining pipeline runs to decide how much of each
  * domain to sample: domains where the reference LM does WORSE (higher
  * mean loss) are upweighted round over round, so the mixture shifts
  * toward under-modeled data instead of whatever the crawl happened to
  * contain. This is the fixed-point companion to
  * [[Sampling.domainMix]]: that operator APPLIES a given mixture; this
  * one produces the mixture's weights from measured per-doc losses.
  *
  * Determinism contract (the KMeans/QualityClassifier replay
  * discipline — the DuckDB oracle replays every round):
  *  - per-doc losses arrive QUANTIZED (integer micro-nats, e.g.
  *    −round(avg_logp·1e6) from [[graft.text.UnigramLm]]);
  *  - per-domain mean loss is one exact long sum + one HALF_UP round;
  *  - each round multiplies weights by the loss (exact long × long,
  *    bounded: w ≤ 1e6 micro, loss ≤ ~2e7 micro → products ≤ 2e13,
  *    domain sums ≪ 2^53) and renormalizes with a single
  *    double-division + HALF_UP round — rational arithmetic only, no
  *    transcendental inside the loop;
  *  - every frame after the one corpus aggregation is DOMAIN-sized
  *    (model-state-sized), so the per-round window sums run over ~20
  *    rows, never the corpus.
  */
object MixtureOptimizer {

  /** Micro-unit quantization for weights and losses. */
  val Scale = 1000000L

  /** Fixed multiplicative-weights round count. */
  val Rounds = 5

  /** Optimize the domain mixture from per-doc quantized losses.
    * Input: one row per doc with (domainCol, lossMicroCol: long ≥ 0).
    * Output per domain: (domain, n_docs, mean_loss, weight) with
    * weight the round-[[Rounds]] multiplicative-weights share (6 dp,
    * micro-exact) and mean_loss the per-domain mean in nats.
    */
  def optimize(perDoc: DataFrame, domainCol: String,
      lossMicroCol: String, rounds: Int = Rounds): DataFrame = {
    require(rounds >= 1, "need at least one round")
    val all = Window.partitionBy()
    // the only corpus-sized stage: one hash-aggregate to domain grain
    val dom = perDoc.groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(lossMicroCol).cast(LongType)).as("__sl"))
      .withColumn("__lmean",
        round(col("__sl").cast(DoubleType) / col("n_docs"))
          .cast(LongType))
    // w₀ = uniform share; every subsequent frame is domain-sized
    val w0 = dom.withColumn("__w",
      round(lit(Scale.toDouble) / count(lit(1)).over(all)).cast(LongType))
    val wR = (1 to rounds).foldLeft(w0) { (f, _) =>
      val n = col("__w") * col("__lmean") // exact long product
      f.withColumn("__w",
        round(n.cast(DoubleType) / sum(n).over(all).cast(DoubleType) *
          Scale.toDouble).cast(LongType))
    }
    wR.select(col("domain"), col("n_docs"),
      round(col("__lmean").cast(DoubleType) / Scale, 6).as("mean_loss"),
      round(col("__w").cast(DoubleType) / Scale, 6).as("weight"))
  }
}
