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
    *
    * Inputs are MASKED to the low [[BitsPerDim]] bits: two keys
    * differing only above bit 15 collide to the same z-value (and
    * negatives wrap), which silently degrades scan pruning on
    * wide-domain columns. Quantize first — `col % 65536` for
    * hash-like keys, or `floor((col - lo) * 65536 / (hi - lo))` to
    * preserve range locality — or pass `strict = true` to fail fast
    * on any out-of-domain value instead of wrapping.
    */
  def zValue(x: Column, y: Column, strict: Boolean = false): Column = {
    val dom = lit((1L << BitsPerDim) - 1)
    val xs = x.cast(LongType).bitwiseAND(dom)
    val ys = y.cast(LongType).bitwiseAND(dom)
    val z = (0 until BitsPerDim).map { i =>
      val xb = shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
    if (!strict) z
    else {
      // NULL coordinates stay NULL (lax behavior — they never wrapped);
      // only a NON-NULL value outside the domain raises. The message
      // coalesces each side so a mixed null/out-of-range row still
      // prints the diagnostic instead of raise_error(NULL).
      val xl = x.cast(LongType)
      val yl = y.cast(LongType)
      val inDomain = (c: Column) =>
        c.isNull || c.between(0L, (1L << BitsPerDim) - 1)
      when(inDomain(xl) && inDomain(yl), z)
        .otherwise(raise_error(concat(
          lit(s"ZOrder.zValue(strict): coordinate outside [0, 2^$BitsPerDim) — " +
            "quantize first (e.g. col % 65536, or a range bucket): x="),
          coalesce(xl.cast(StringType), lit("NULL")),
          lit(" y="), coalesce(yl.cast(StringType), lit("NULL")))).cast(LongType))
    }
  }

  /** Repartition-by-range + in-partition sort on the z-value of
    * (xCol, yCol): the layout step before a clustered write. Returns
    * the frame with the `z` column retained (writers drop it).
    *
    * Both coordinates must already be in `[0, 2^16)` — see [[zValue]]
    * for the quantization recipes; `strict = true` makes out-of-domain
    * values fail the job instead of silently wrapping into colliding
    * z-values (degraded pruning, no error).
    */
  def sortByZ(df: DataFrame, xCol: String, yCol: String,
      partitions: Int = 0, strict: Boolean = false): DataFrame = {
    require(!df.columns.contains("z"),
      "input already has a 'z' column — rename it before sortByZ")
    val withZ = df.withColumn("z", zValue(col(xCol), col(yCol), strict))
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withZ.repartitionByRange(n, col("z")).sortWithinPartitions(col("z"))
  }
}
