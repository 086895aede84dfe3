package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding corpus with deterministic
  * k-means, then WITHIN each cluster drop every vector that has a
  * more-senior (lower-id) neighbor at cosine ≥ `tau`. Unlike the
  * shingle-based dedup family this catches semantic near-duplicates —
  * paraphrases, translations, templated rewrites — that share no
  * surface n-grams.
  *
  * Scale shape: the cluster count `k` is THE scale knob — the paper
  * sizes k so the expected cluster occupancy stays constant
  * (k ≈ N / target_occupancy, e.g. 11k clusters for LAION-440M), which
  * keeps the within-cluster pairwise stage at O(N · occupancy) total
  * work, never O(N²). The plan is: one narrow literal-centroid argmin
  * stage (no join — the trained centroids ride as expressions), one
  * shuffle of the corpus keyed by cluster for the self-join, and a
  * partial-aggregated max per dropped id. A pathologically hot cluster
  * is an AQE-skew-join case; if occupancy can't be bounded by k alone,
  * compose with the sign-projection blocking of
  * [[graft.dedup.Dedup.embeddingNearDupPairs]] inside each cluster.
  */
object SemDedup {

  /** One row per input vector: (vec_id, cluster, kept, max_dup_sim).
    * `kept` is false iff some lower-id vector in the same cluster has
    * cosine ≥ `tau` (the greedy keep-the-senior rule — deterministic
    * and engine-agnostic because the comparison is on the 6-dp rounded
    * cosine); `max_dup_sim` is the strongest such duplicate's rounded
    * cosine, NULL for kept rows.
    */
  def semDedup(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 3, tau: Double = 0.3): DataFrame = {
    val m = KMeans.fit(vectors, idCol, vecCol, k, iters)
    // assignment keeps the vector: no join back to the corpus; norm
    // staged once per row so the pairwise stage is one dot fold/pair
    val keyed = graft.CacheRegistry.register(
      KMeans.assignWith(graft.ops.Parallelism.widen(vectors), idCol, vecCol, m)
        .withColumn("nrm", Ann.norm(col("x")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val a = keyed.select(col("cluster"), col("vec_id").as("id_a"),
      col("x").as("x_a"), col("nrm").as("nrm_a"))
    val b = keyed.select(col("cluster"), col("vec_id").as("id_b"),
      col("x").as("x_b"), col("nrm").as("nrm_b"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_b").as("vec_id"),
        round(Ann.cosinePre(Ann.dot(col("x_a"), col("x_b")),
          col("nrm_a"), col("nrm_b")), 6).as("cs"))
      .filter(col("cs") >= tau)
      .groupBy(col("vec_id"))
      .agg(max(col("cs")).as("max_dup_sim"))
    keyed.select(col("vec_id"), col("cluster"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        col("max_dup_sim").isNull.as("kept"), col("max_dup_sim"))
  }
}
