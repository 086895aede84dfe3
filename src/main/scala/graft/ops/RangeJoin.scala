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
    val cells = intervals.withColumn("__cell",
      explode(sequence(
        floor(col(loCol) / g).cast(LongType),
        ceil(col(hiCol) / g).cast(LongType) - 1)))
    points.withColumn("__cell", floor(col(pointCol) / g).cast(LongType))
      .join(cells, Seq("__cell"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__cell")
  }
}
