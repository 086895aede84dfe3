package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Point-in-interval range join via grid bucketing — the shuffle-based
  * scale path for what Spark otherwise plans as a broadcast-nested-
  * loop (fine for a literal band table, quadratic disaster when both
  * sides are large).
  *
  * Intervals [lo, hi) are exploded to the grid cells they overlap
  * (cell width `g`); a point hashes to exactly ONE cell, so the
  * equi-join on cell id emits each (point, interval) candidate at most
  * once — no post-dedup — and the residual predicate filters partial
  * overlaps. Shuffle volume = points + Σ ceil(len/g) interval
  * replicas; pick `g` near the median interval length so replication
  * stays O(1) per interval.
  */
object RangeJoin {

  /** @param points    rows with a numeric `pointCol`
    * @param intervals rows with numeric `[loCol, hiCol)` bounds, lo < hi
    * @param g         grid cell width (same units as the point column)
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String, g: Double): DataFrame = {
    // empty/inverted intervals match nothing under [lo, hi) — filter
    // BEFORE the explode: sequence(a, b) runs DESCENDING when a > b,
    // so one dirty inverted row would otherwise explode into a huge
    // spurious cell list
    val cells = intervals.filter(col(loCol) < col(hiCol)).withColumn("__cell",
      explode(sequence(
        floor(col(loCol) / g).cast(LongType),
        ceil(col(hiCol) / g).cast(LongType) - 1)))
    points.withColumn("__cell", floor(col(pointCol) / g).cast(LongType))
      .join(cells, Seq("__cell"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__cell")
  }

  /** INTERVAL-overlap join — both sides are interval tables and a pair
    * matches when `[aLo, aHi) ∩ [bLo, bHi) ≠ ∅` (the session × campaign
    * / observation × outage shape). Same grid discipline as
    * [[pointInInterval]], with the extra subtlety that overlapping
    * intervals co-occupy EVERY shared cell: emitting the pair only
    * from its FIRST shared cell — `max(floor(aLo/g), floor(bLo/g))`,
    * a pure per-pair expression — keeps the join emit-once with no
    * distinct/dedup shuffle afterwards. Shuffle volume =
    * Σ ceil(len/g) replicas of each side; pick `g` near the median
    * interval length. The oracle is the plain overlap theta join —
    * the grid never changes the answer, only the plan.
    *
    * Column name collisions between the two sides are the caller's to
    * avoid (same contract as Spark's own join on a USING column).
    */
  /** @param keys extra equi-join columns shared by both sides (the
    *              usual per-entity scoping, e.g. user_id) — they ride
    *              the same shuffle as the cell id
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      aLo: String, aHi: String, bLo: String, bHi: String,
      g: Double, keys: Seq[String] = Seq.empty): DataFrame = {
    def cells(df: DataFrame, lo: String, hi: String) =
      // same inverted-interval guard as [[pointInInterval]]
      df.filter(col(lo) < col(hi)).withColumn("__cell",
        explode(sequence(
          floor(col(lo) / g).cast(LongType),
          ceil(col(hi) / g).cast(LongType) - 1)))
    cells(a, aLo, aHi).join(cells(b, bLo, bHi), "__cell" +: keys)
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .filter(col("__cell") ===
        greatest(floor(col(aLo) / g).cast(LongType),
          floor(col(bLo) / g).cast(LongType)))
      .drop("__cell")
  }
}
