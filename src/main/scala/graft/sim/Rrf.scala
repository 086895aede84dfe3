package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to
  * combine heterogeneous retrievers (lexical BM25, exact cosine,
  * projected/ANN candidates): each list contributes 1/(k0 + rank) per
  * item, so agreement across lists dominates any single list's score
  * scale. Hybrid search in one operator.
  *
  * Determinism: contributions are exact integers — Scale div
  * (k0 + rank) — so the fused score is an exact integer sum (no float
  * addition anywhere), directly comparable across engines.
  *
  * Scale shape: inputs are already top-k lists (bounded per query);
  * fusion is one union + one partial-aggregated (query, id) sum + a
  * per-query top-k window over ≤ Σk_i candidates. Nothing touches the
  * corpus.
  */
object Rrf {

  /** Integer contribution scale: rank 1 at k0=60 scores
    * Scale div 61 = 16,393,442.
    */
  val Scale = 1000000000L

  /** Fuse rankings (each with columns query_id, id, rank) into
    * (query_id, id, rrf_score, n_lists, rank), keeping the top `k`
    * fused ids per query; ties break to the lower id.
    */
  def fuse(rankings: Seq[DataFrame], k0: Int = 60, k: Int = 5): DataFrame = {
    require(rankings.nonEmpty && k0 >= 0 && k >= 1)
    val u = rankings
      .map(_.select(col("query_id"), col("id"), col("rank")))
      .reduce(_ unionAll _)
    val scored = u
      .select(col("query_id"), col("id"),
        expr(s"${Scale}L div ($k0 + rank)").as("c"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum(col("c")).as("rrf_score"), count(lit(1)).as("n_lists"))
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("rrf_score").desc, col("id").asc)))
      .filter(col("rank") <= k)
  }
}
