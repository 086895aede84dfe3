package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic training-order scheduling — the LAST mile of the
  * mixture pipeline: [[MixtureOptimizer]] / the temperature mixers
  * decide HOW MUCH of each domain to train on; this operator decides
  * WHEN, emitting the single global ordering the data loader streams.
  *
  * Stride scheduling (Waldspurger & Weihl, OSDI'94 — the
  * deterministic twin of lottery scheduling, same mechanics as WFQ
  * virtual time): domain d's r-th document (r = 0-based, in a
  * deterministic hash-shuffled within-domain order) is released at
  * virtual time v = (r+1)/w_d; the training order sorts by
  * (v, domain, id). Any prefix of length L then contains each
  * domain in proportion w_d/Σw to within ±1 document — smooth
  * interleaving, not domain-chunked epochs, which matters because
  * chunked ordering is a curriculum artifact the loss curve sees.
  *
  * Scale shape: both ranks — the within-domain rank and the final
  * global position — are range-sharded global ranks
  * (SortedNeighborhood.rankByOrder: two full-data shuffles each,
  * bounded per-shard sorts, NO single-reducer window and NO
  * per-domain data-sized window; the per-domain rank falls out of ONE
  * global rank over (domain, shuffle-key, id) minus each domain's min
  * rank, the qRankTransform trick). The weights frame is
  * domain-sized — model state, broadcast by AQE.
  *
  * Determinism: the shuffle key is the integer text hash of the id,
  * weights are exact doubles, v = (r+1)/w_d is one double divide —
  * the whole order replays bit-for-bit in any engine.
  */
object Curriculum {

  /** Emit the global training order.
    *
    * @param df      corpus rows
    * @param weights (domainCol, "weight") frame — domain-sized;
    *                relative values only (the order is scale-free)
    * @return (position, id, domain, domain_rank, vtime): position is
    *         the dense global 0-based training position
    */
  def order(df: DataFrame, idCol: String, domainCol: String,
      weights: DataFrame, numShards: Int = 32): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(domainCol).as("domain"))
      .withColumn("shuf",
        graft.text.TextAnalysis.hash60(col("id").cast(StringType)))
    val ranked = graft.dedup.SortedNeighborhood.rankByOrder(
      keyed, Seq("domain", "shuf", "id"), numShards)
    val base = ranked.groupBy(col("domain"))
      .agg(min(col("snm_rank")).as("__r0")) // domain-sized
    // LEFT join + loud guard: an inner join would silently drop every
    // document of a domain missing from the weights frame (typo,
    // stale mixture output, new domain in the corpus) and the
    // re-densified positions would hide the loss downstream
    val v = ranked.join(base, Seq("domain"))
      .join(weights.select(col(domainCol).as("domain"), col("weight")),
        Seq("domain"), "left")
      .withColumn("weight",
        when(col("weight").isNull, raise_error(concat(
          lit("Curriculum.order: no weight for domain "), col("domain"))))
          .otherwise(col("weight")))
      .withColumn("domain_rank", col("snm_rank") - col("__r0"))
      .withColumn("vtime",
        (col("domain_rank").cast(DoubleType) + 1.0d) / col("weight"))
      .select(col("id"), col("domain"), col("domain_rank"), col("vtime"))
    graft.dedup.SortedNeighborhood.rankByOrder(
      v, Seq("vtime", "domain", "id"), numShards)
      .select(col("snm_rank").as("position"), col("id"), col("domain"),
        col("domain_rank"), round(col("vtime"), 6).as("vtime"))
  }
}
