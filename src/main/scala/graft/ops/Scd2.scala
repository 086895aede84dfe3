package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type 2 — collapse an ordered change
  * stream into versioned validity intervals per key: one row per
  * distinct run of attribute values, with [valid_from, valid_to)
  * half-open intervals, a per-key version counter, and an is_current
  * flag on the open interval. The dimension-history maintenance
  * operator of a warehouse (and the batch shape of a CDC changelog
  * compaction — [[Upsert]] keeps only the latest image; this keeps
  * them all, time-sliced).
  *
  * A version opens where ANY tracked attribute differs from the
  * previous row of the same key (null-safe: NULL→value and
  * value→NULL are both changes); repeated identical rows collapse
  * into the version that opened the run. `valid_to` of one version
  * equals `valid_from` of the next, so an as-of lookup is
  * `valid_from <= t AND (t < valid_to OR valid_to IS NULL)` — the
  * [[AsOfJoin]] / [[RangeJoin]] probe shape.
  *
  * Determinism: `(tsCol, tieCols)` must order each key's rows
  * totally — same contract as [[Packing]] and sessionizeBatch; rows
  * sharing a timestamp without a tie-break would make "previous row"
  * engine-dependent.
  *
  * Scale shape: two window passes over the SAME `partitionBy(keys)`
  * shuffle — Spark plans consecutive windows on one partitioning as
  * a single Exchange — and the second window runs on the
  * change-points only (≤ input, typically ≪). No join, no driver
  * state; each key's history streams through one task regardless of
  * corpus size. Skew bound: a key's full history must sort within
  * one task — the usual window contract, fine for dimension keys.
  */
object Scd2 {

  /** Build the versioned history: (keyCols…, attrCols…, valid_from,
    * valid_to, version, is_current).
    */
  def build(updates: DataFrame, keyCols: Seq[String], tsCol: String,
      attrCols: Seq[String], tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && attrCols.nonEmpty, "need keys and attrs")
    val ord = (tsCol +: tieCols).map(col)
    val rowW = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val attrs = struct(attrCols.map(col): _*)
    val changed = updates
      .withColumn("__prev", lag(attrs, 1).over(rowW))
      // first row of a key (prev NULL-struct) and any attr change open
      // a version; <=> makes NULL attr values compare stably
      .filter(col("__prev").isNull || !(col("__prev") <=> attrs))
    // the SAME window spec as change detection — one partitioning,
    // one Exchange (and no way for the two passes to desynchronize)
    changed.select(
      (keyCols ++ attrCols).map(col) ++ Seq(
        col(tsCol).as("valid_from"),
        lead(col(tsCol), 1).over(rowW).as("valid_to"),
        row_number().over(rowW).cast("long").as("version"),
        lead(col(tsCol), 1).over(rowW).isNull.as("is_current")): _*)
  }
}
