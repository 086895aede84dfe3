package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character-level Shannon entropy of a text column — the
  * compressibility proxy of web-scale quality filtering: machine
  * boilerplate, base64 blobs and keyword-stuffed spam sit at the
  * extremes of the per-character entropy distribution while natural
  * prose clusters around ~4.1 bits-equivalent (we report nats), so an
  * entropy band is a cheap first-pass gate before any LM scoring.
  *
  * The computation is per-document only (no corpus state), so the
  * correct 100 TB shape is a pure narrow map: ONE native kernel call
  * per row inside whole-stage codegen — never the explode(chars) →
  * shuffle formulation, which would shuffle one row per CHARACTER
  * (a ~500× blowup on prose) to compute a row-local quantity.
  *
  * Determinism across engines (the oracle replays this in DuckDB):
  * each distinct code point's log-probability is quantized ONCE to an
  * integer (round(ln(c/n)·1e6), HALF_UP = away-from-zero on ties,
  * matching both Spark's Round and DuckDB's round), accumulated as an
  * exact integer dot product Σ c·lp, and divided once at the end —
  * no order-dependent float accumulation anywhere, the UnigramLm
  * discipline at character granularity.
  */
object CharEntropyKernel {

  private val Scale = 1000000L

  private def roundHalfUp(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  private def round6(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Entropy in nats, rounded to 6 dp; empty text → 0.0. Counts
    * Unicode code points (= DuckDB's character split granularity).
    */
  def entropyQ6(text: UTF8String): Double = {
    val s = text.toString
    if (s.isEmpty) return 0.0
    // ASCII fast path: dense table, no boxing — the corpus hot path
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Integer] = null
    var n = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Integer]()
        other.merge(cp, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
      }
      n += 1
      i += Character.charCount(cp)
    }
    var slp = 0L
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 0) slp += k * roundHalfUp(math.log(k.toDouble / n) * Scale)
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val k = it.next().intValue()
        slp += k * roundHalfUp(math.log(k.toDouble / n) * Scale)
      }
    }
    round6(-slp.toDouble / n / Scale)
  }
}

/** Per-row character entropy (nats, 6 dp) — one pass, codegen'd. */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    CharEntropyKernel.entropyQ6(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropyKernel.entropyQ6($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

object CharEntropy {
  def char_entropy(text: Column): Column =
    Bridge.toColumn(CharEntropyExpr(Bridge.toExpression(text)))
}
