package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline — the non-dominated frontier of a
  * maximize/minimize pair (e.g. quality vs token cost): row p is on
  * the front iff no row beats it on one dimension without losing on
  * the other. Curation use: the quality-per-token efficient frontier
  * picks the documents no budget-constrained selection policy would
  * ever skip, without committing to a single quality/cost trade-off
  * weight up front.
  *
  * Definition (ties kept): p dominated ⇔ ∃p′ with (max′ ≥ max ∧
  * min′ ≤ min) ∧ (max′ > max ∨ min′ < min). Duplicate (max, min)
  * points do not dominate each other and all stay on the front.
  *
  * Scale shape — NOT the quadratic NOT EXISTS: group to one row per
  * distinct max-value level (keyed shuffle, partial-aggregated min),
  * run ONE single-partition window over the LEVEL frame (bounded by
  * distinct levels, not rows — for a 6-decimal quality score that is
  * ≤ 10⁶ rows whatever the corpus size), then join the per-level
  * thresholds back (broadcastable for the same reason). A row
  * survives iff it achieves its level's min AND strictly beats the
  * best min among all strictly-higher levels — algebraically equal to
  * the pairwise definition, O(N) + one tiny sort instead of O(N²).
  */
object Skyline {

  /** Rows of `df` on the front: maximize `maxCol`, minimize `minCol`.
    * Schema passes through unchanged.
    */
  def front2d(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    val mt = df.groupBy(col(maxCol))
      .agg(min(col(minCol)).as("__mt"))
    // suffix-min over strictly higher levels; first (highest) level
    // has an empty frame → null → never dominated from above
    val w = Window.orderBy(col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val lv = mt.withColumn("__ms", min(col("__mt")).over(w))
    df.join(lv, Seq(maxCol))
      .filter(col(minCol) === col("__mt") &&
        (col("__ms").isNull || col(minCol) < col("__ms")))
      .select(df.columns.map(col): _*) // join key first → restore caller order
  }
}
