package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Rank-statistic evaluation metrics for learned gates — the readout a
  * data pipeline runs on a quality/toxicity/language classifier before
  * trusting it to filter a corpus (reference analogue: the reference
  * publishes survey acceptance summaries, e.g.
  * /root/reference/src/nass.sql:224-230; a learned-filter pipeline needs
  * the same "is the score usable" audit for its models).
  *
  * ROC-AUC via the tie-aware Mann–Whitney U statistic:
  *
  *   AUC = (R − P(P+1)/2) / (P·N)
  *
  * where R is the rank-sum of the positives under average ("mid") ranks
  * for ties, P/N the positive/negative counts. Equivalently the
  * probability a random positive outranks a random negative, ties at ½.
  *
  * Scale shape — the whole point of the formulation: the corpus-sized
  * frame is reduced by ONE hash aggregate keyed on the (quantized) score
  * before any ordering happens. Scores here are 6-dp-rounded doubles, so
  * the per-score frame is bounded by the score codomain (≤ 10^6+1 rows,
  * CORPUS-SIZE-INVARIANT — same discipline as the vocab-sized frames in
  * the drift queries), and the rank arithmetic runs as a window over
  * that bounded frame. No global row sort, no per-row window: a
  * row_number() formulation would sort 100 TB through one ordering —
  * this never touches row-level data after the score aggregate.
  *
  * Exactness: mid-ranks are half-integers, so the rank-sum is carried as
  * 2R (an exact long: Σ p_g·(2·cumBefore_g + n_g + 1)); the only double
  * op is the final division, mirrored operation-for-operation by the
  * DuckDB oracle — hash-stable across engines.
  */
object RankMetrics {

  /** One-row frame: (n_pos, n_neg, auc, gini) for a scored, binary-
    * labeled dataset. `label` must be 0/1 (cast to long); `score` should
    * be quantized (e.g. 6-dp rounded) — the group-by key's cardinality
    * bounds the post-aggregate frame.
    */
  def binaryAuc(scored: DataFrame, score: Column, label: Column): DataFrame = {
    val byScore = scored
      .groupBy(score.as("s"))
      .agg(count(lit(1)).as("n"), sum(label.cast(LongType)).as("p"))
    // cumulative count of rows scoring strictly below this group; the
    // window frame is the score-codomain-bounded aggregate, never rows
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byScore
      .withColumn("cumb", coalesce(sum(col("n")).over(w), lit(0L)))
    // rank-sum products in DECIMAL(38,0): p_g·(2·cumB_g+n_g+1) can pass
    // 2^63 once the corpus passes ~10^9 rows (cumB is corpus-sized);
    // DECIMAL keeps the statistic exact to ~10^19 rows — the DuckDB
    // oracle's HUGEINT accumulates the same integers
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val totals = ranked.agg(
      sum(col("p").cast(big) *
        (col("cumb") * 2L + col("n") + 1L).cast(big)).as("r2"),
      sum(col("p")).as("n_pos"),
      sum(col("n") - col("p")).as("n_neg"))
    val num = (col("r2") -
      col("n_pos").cast(big) * (col("n_pos") + 1L).cast(big))
      .cast(DoubleType)
    val pn = col("n_pos").cast(big) * col("n_neg").cast(big)
    totals.select(
      col("n_pos"), col("n_neg"),
      round(num / (pn * 2).cast(DoubleType), 6).as("auc"),
      round(num / pn.cast(DoubleType) - 1.0d, 6).as("gini"))
  }

  /** Average precision (PR-AUC) at DISTINCT-SCORE granularity — the
    * sklearn `average_precision_score` step-sum Σ_t (R_t − R_{t−1})·P_t
    * over descending score thresholds, which is also the principled
    * tie handling (a threshold can't split a tied group; cf. McSherry
    * & Najork, ECIR 2008, on measure computation under tied scores).
    * The ranking-quality companion to [[binaryAuc]] for imbalanced
    * gates: AUC ignores the positive-class rarity that PR space is
    * built around.
    *
    * Same scale discipline as [[binaryAuc]]: one score-keyed hash
    * aggregate, then windows over the score-codomain-bounded frame.
    * Each group's term (p_g/P)·(cumTP_g/cumN_g) is an
    * identically-ordered double from exact integers, quantized to
    * nano-units and summed as exact longs — so the sum is partition-
    * order-independent AND cross-engine exact (the codebase's
    * nano-unit summation discipline).
    */
  def averagePrecision(scored: DataFrame, score: Column,
      label: Column): DataFrame = {
    val byScore = scored
      .groupBy(score.as("s"))
      .agg(count(lit(1)).as("n"), sum(label.cast(LongType)).as("p"))
    val desc = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    val terms = byScore
      .withColumn("cum_tp", sum(col("p")).over(desc))
      .withColumn("cum_n", sum(col("n")).over(desc))
      .withColumn("tot_p", sum(col("p")).over(all))
      .withColumn("tot_n", sum(col("n")).over(all))
    val term = col("p").cast(DoubleType) / col("tot_p").cast(DoubleType) *
      (col("cum_tp").cast(DoubleType) / col("cum_n").cast(DoubleType))
    terms
      .withColumn("nano", round(term * 1.0e9d).cast(LongType))
      .agg(max(col("tot_p")).as("n_pos"),
        max(col("tot_n") - col("tot_p")).as("n_neg"),
        round(sum(col("nano")).cast(DoubleType) / 1.0e9d, 6).as("ap"))
  }
}
