package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Retrieval-quality evaluation INSIDE the engine — recall@k and
  * reciprocal rank of an approximate top-k run against the exact
  * brute-force answer on the same queries. Tuning an ANN index
  * (planes, probes, nlist/nprobe) without this loop means shipping a
  * recall number nobody measured; with it, the A/B is one query over
  * two already-verified operators.
  *
  * Scale shape: both inputs are per-query top-k frames (bounded:
  * |queries|·k rows), so the join and the per-query aggregate are
  * sketch-sized regardless of corpus size — the expensive part is
  * producing the exact baseline, which the caller scopes to a query
  * SAMPLE (the standard recall-audit practice).
  */
object RetrievalEval {

  /** Per-query quality of `approx` vs `exact`, both shaped
    * (query_id, neighbor_id, …, rank): n_exact, n_hit,
    * recall = n_hit/n_exact, rr = 1/first-hit approx rank (0 when
    * nothing was found — e.g. the query's LSH bucket was empty).
    */
  def vsExact(exact: DataFrame, approx: DataFrame): DataFrame = {
    // Both sides are collapsed to one row per (query_id, neighbor_id)
    // BEFORE the join: a duplicated neighbor row in either input would
    // silently inflate n_exact/n_hit (each exact row multiplies by its
    // approx match count). The approx side keeps its BEST (minimum)
    // rank — a deterministic reduction, unlike dropDuplicates'
    // arbitrary-row pick — which is also what rr reads downstream.
    val ap = approx.select(col("query_id"), col("neighbor_id"),
      col("rank").as("__ap_rank"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(min(col("__ap_rank")).as("__ap_rank"))
    exact.select(col("query_id"), col("neighbor_id")).distinct()
      .join(ap, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(
        count(lit(1)).as("n_exact"),
        sum(when(col("__ap_rank").isNotNull, 1L).otherwise(0L)).as("n_hit"),
        round(sum(when(col("__ap_rank").isNotNull, 1L).otherwise(0L))
          .cast(DoubleType) / count(lit(1)).cast(DoubleType), 6).as("recall"),
        round(coalesce(lit(1.0) / min(col("__ap_rank")).cast(DoubleType),
          lit(0.0)), 6).as("rr"))
  }
}
