package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Hilbert-curve clustering — the locality-superior sibling of
  * [[ZOrder]]: both map two dimensions onto one sort key, but the
  * Hilbert walk visits cells so that CONSECUTIVE keys are always
  * Manhattan-adjacent (no long jumps), while the Morton walk jumps
  * across the grid at every power-of-two boundary. For file layout
  * that means tighter per-file min/max envelopes on both dimensions
  * and strictly better scan pruning at the same sort cost — the
  * reason lakehouse clustering migrated from ZORDER to Hilbert.
  * HilbertSpec measures it: max |Δcell| between consecutive keys is 1
  * for Hilbert vs grid-width jumps for Morton.
  *
  * The mapping is the canonical iterative xy→d walk (rx/ry quadrant
  * bits, quadrant rotation by reflect+swap), bits high→low. A Column
  * expression tree can't express it — x and y mutate each round, so
  * an unrolled tree doubles per bit (2^16 nodes); instead the walk is
  * a native [[HilbertD]] expression whose codegen calls one static
  * JVM kernel, and the DuckDB oracle replays the identical arithmetic
  * as a 16-step chained-CTE unroll ([[oracleSqlSteps]]) where each
  * step materializes (x, y, d) columns.
  *
  * Scale shape: identical to [[ZOrder]] — the key is a narrow
  * codegen'd map; the layout is one range-repartition + in-partition
  * sort. Inputs are masked to [[ZOrder.BitsPerDim]] bits (quantize
  * wider domains first, same recipes as [[ZOrder.zValue]]).
  */
object Hilbert {

  val Bits: Int = ZOrder.BitsPerDim

  /** The iterative xy→d kernel, shared by eval, codegen, and (by
    * transliteration) the SQL oracle. After consuming quadrant bit
    * `s`, coordinates are reduced MOD s before the rotation, so the
    * reflection `s-1-x` never sees higher bits.
    */
  def hilbertD(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      x &= s - 1
      y &= s - 1
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Hilbert distance of two non-negative integer columns (masked to
    * [[Bits]] bits — see [[ZOrder.zValue]] for quantization recipes).
    */
  def hValue(x: Column, y: Column): Column =
    Bridge.toColumn(HilbertD(
      Bridge.toExpression(x.cast(LongType)),
      Bridge.toExpression(y.cast(LongType)), Bits))

  /** Range-repartition + in-partition sort on the Hilbert key —
    * [[ZOrder.sortByZ]] with the better walk.
    */
  def sortByH(df: DataFrame, xCol: String, yCol: String,
      partitions: Int = 0): DataFrame = {
    require(!df.columns.contains("h"),
      "input already has an 'h' column — rename it before sortByH")
    val withH = df.withColumn("h", hValue(col(xCol), col(yCol)))
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withH.repartitionByRange(n, col("h")).sortWithinPartitions(col("h"))
  }

  /** DuckDB mirror: chained CTEs `h<bits> … h0` transliterating
    * [[hilbertD]] step by step (each step materializes the mutated
    * (x, y, d), so there is no expression blow-up). `fromSql` must
    * expose columns `x`, `y` plus whatever `keep` lists; the final
    * SELECT emits `keep` and `d AS h`.
    */
  def oracleSqlSteps(fromSql: String, keep: Seq[String], bits: Int = Bits): String = {
    val keepCols = keep.mkString(", ")
    val steps = (0 until bits).map { i =>
      val s = 1L << (bits - 1 - i)
      val prev = if (i == 0) "hin" else s"h${i - 1}"
      val sm = s - 1
      s"""h$i AS (
         |  SELECT $keepCols,
         |    d + cast(${s * s} as bigint) * xor(3 * rx, ry) AS d,
         |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN $sm - (y & $sm) ELSE y & $sm END)
         |         ELSE x & $sm END AS x,
         |    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN $sm - (x & $sm) ELSE x & $sm END)
         |         ELSE y & $sm END AS y
         |  FROM (SELECT $keepCols, x, y, d,
         |          CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |          CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
         |        FROM $prev))""".stripMargin
    }
    val mask = (1L << bits) - 1
    s"""WITH hin AS (
       |  SELECT $keepCols, cast(x as bigint) & $mask AS x,
       |    cast(y as bigint) & $mask AS y, cast(0 as bigint) AS d
       |  FROM $fromSql),
       |${steps.mkString(",\n")}
       |SELECT $keepCols, d AS h FROM h${bits - 1}""".stripMargin
  }
}

/** Native Hilbert xy→d expression: one static-kernel call per row,
  * inside whole-stage codegen — see [[Hilbert]] for why this cannot
  * be a Column expression tree.
  */
case class HilbertD(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && bits <= 31, "bits must lie in [1, 31]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.hilbertD(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.ops.Hilbert.hilbertD($x, $y, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertD =
    copy(left = newLeft, right = newRight)
}
