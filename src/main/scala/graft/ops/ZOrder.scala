package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering — the multi-dimensional data-layout
  * technique behind lakehouse `OPTIMIZE ZORDER BY`: interleaving the
  * bits of two key columns gives a single sort key under which rows
  * close in EITHER dimension land in the same files, so parquet
  * min/max stats prune scans filtered on either column (a plain
  * two-column sort only prunes the leading one).
  *
  * The z-value is exact integer bit math (shift/mask/or), so it is
  * reproducible in any engine — unlike hash-based clustering keys.
  *
  * Scale shape: computing the key is a narrow map; laying data out is
  * one range-repartition + in-partition sort (`sortByZ`) — exactly the
  * shuffle a write-time `ORDER BY` costs, paid once so that every
  * subsequent selective scan on either dimension reads fewer files.
  */
object ZOrder {

  /** Bits taken from each coordinate (values are masked to this many
    * low bits first — callers quantize wider domains down, e.g.
    * `col % 65536` or a range bucket).
    */
  val BitsPerDim = 16

  /** Morton-interleave two non-negative integer columns: bit i of `x`
    * goes to bit 2i, bit i of `y` to bit 2i+1. Pure shift/mask/or
    * expression tree — codegen'd, no UDF.
    */
  def zValue(x: Column, y: Column): Column = {
    val xs = x.cast(LongType).bitwiseAND(lit((1L << BitsPerDim) - 1))
    val ys = y.cast(LongType).bitwiseAND(lit((1L << BitsPerDim) - 1))
    (0 until BitsPerDim).map { i =>
      val xb = shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** Repartition-by-range + in-partition sort on the z-value of
    * (xCol, yCol): the layout step before a clustered write. Returns
    * the frame with the `z` column retained (writers drop it).
    */
  def sortByZ(df: DataFrame, xCol: String, yCol: String,
      partitions: Int = 0): DataFrame = {
    require(!df.columns.contains("z"),
      "input already has a 'z' column — rename it before sortByZ")
    val withZ = df.withColumn("z", zValue(col(xCol), col(yCol)))
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withZ.repartitionByRange(n, col("z")).sortWithinPartitions(col("z"))
  }
}
