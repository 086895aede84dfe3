package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — combine a PRECOMPUTED grouped
  * aggregate with a delta batch's aggregate instead of rescanning
  * history: the materialized-view refresh move for algebraic
  * aggregates (counts and sums add; mins and maxes take extrema;
  * avg = merged sum / merged count downstream). The warehouse shape
  * behind "last night's rollup + today's partition", and the batch
  * twin of what a streaming agg's state store does per micro-batch.
  *
  * Merge = unionByName + one re-aggregation over the SAME grouping
  * keys: each input row is already a partial state, so the combine is
  * exactly Spark's own partial-aggregation semantics, keyed and
  * mergeable — applying it k times over k deltas associates freely.
  * NULL discipline: a key absent from one side contributes nothing
  * (sum/min/max ignore the missing side); sums over an all-NULL
  * column stay NULL, matching what a full recompute would produce.
  *
  * Scale shape: one shuffle over |old agg| + |delta agg| rows — the
  * cardinality of the GROUPED result, not of the history that
  * produced it. That is the entire point: the 100 TB of history is
  * never touched again.
  */
object IncrementalAgg {

  /** Merge partial aggregates sharing a schema: (keyCols…, sumCols…,
    * minCols…, maxCols…). Column sets must be disjoint and cover all
    * non-key columns of both frames.
    */
  def merge(oldAgg: DataFrame, deltaAgg: DataFrame, keyCols: Seq[String],
      sumCols: Seq[String], minCols: Seq[String] = Nil,
      maxCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && sumCols.nonEmpty, "need keys and sums")
    val stateCols = sumCols ++ minCols ++ maxCols
    val expected = (keyCols ++ stateCols).sorted
    Seq(oldAgg, deltaAgg).foreach { df =>
      require(df.columns.sorted.sameElements(expected),
        s"schema mismatch: ${df.columns.mkString(",")} vs $expected")
    }
    val combine =
      sumCols.map(c => sum(col(c)).as(c)) ++
        minCols.map(c => min(col(c)).as(c)) ++
        maxCols.map(c => max(col(c)).as(c))
    oldAgg.unionByName(deltaAgg)
      .groupBy(keyCols.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }
}
