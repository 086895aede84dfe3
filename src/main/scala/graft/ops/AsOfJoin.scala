package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark SQL lacks as a
  * primitive. For every left row, attach the single latest right row
  * whose timestamp is ≤ the left row's timestamp, per key (DuckDB
  * `ASOF JOIN` / kdb `aj` semantics, inclusive on equality).
  *
  * Implementation is the scalable union-window form, NOT a range
  * theta-join: both sides are tagged and unioned, then one window pass
  * per key ordered by (ts, side-tag) carries the last seen right-side
  * payload forward (`last(..., ignoreNulls)` over an unbounded-
  * preceding frame). Cost = ONE shuffle on the key — at 100 TB this is
  * a single sort-exchange, whereas the naive `l.ts >= r.ts` theta join
  * is a broadcast-nested-loop (quadratic per key). Right rows sort
  * BEFORE left rows at equal timestamps, which yields the inclusive
  * (≥) match.
  *
  * The right side must be unique per (keys, ts) — the caller
  * pre-aggregates if needed; duplicate right timestamps would make
  * "the" as-of row ambiguous in any engine.
  */
object AsOfJoin {

  /** @param left      probe rows (all columns preserved)
    * @param right     reference rows: keys, `rightTs`, payload columns
    * @param keys      equi-key columns present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param payload   right-side columns to attach (null when no right
    *                  row is ≤ the left timestamp yet)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // a payload column sharing a name with a left column would produce
    // ambiguous/duplicate output columns — reject up front
    val overlap = payload.toSet.intersect(leftCols.toSet)
    require(overlap.isEmpty,
      s"payload columns must be disjoint from left columns: ${overlap.mkString(", ")}")
    // Payload rides as ONE struct, so ROW presence (not per-value
    // nullness) drives the match: a right row whose payload value is
    // genuinely NULL still wins (DuckDB ASOF attaches the matched
    // row's NULL); per-column last(_, ignoreNulls) would skip it and
    // fall back to an older right row.
    val payStruct = struct(payload.map(col): _*)
    val payType = org.apache.spark.sql.types.StructType(
      payload.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    // tag 0 = right (sorts first at equal ts → inclusive match),
    // tag 1 = left
    val taggedRight = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        payStruct.as("__pay")) ++
        leftCols.filterNot(c => keys.contains(c)).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(payType).as("__pay")) ++
        leftCols.filterNot(c => keys.contains(c)).map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    taggedRight.unionByName(taggedLeft)
      .select((keys.map(col) :+ col("__ts") :+ col("__side")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        last(col("__pay"), ignoreNulls = true).over(w).as("__asof"): _*)
      .filter(col("__side") === 1)
      .select((keys.map(col) ++ leftCols.filterNot(keys.contains).map(col)) ++
        payload.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }
}
