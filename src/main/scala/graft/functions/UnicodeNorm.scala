package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernel — the dedup-evasion fix every
  * web-scale text pipeline needs BEFORE fingerprinting: "café" exists
  * in the wild both composed (U+00E9) and decomposed (e + U+0301
  * combining acute), and a byte-level fingerprint treats them as
  * different documents. Normalizing to NFC collapses canonical
  * equivalents; NFKC additionally folds compatibility forms
  * (ligatures ﬁ→fi, fullwidth Ａ→A, superscripts) — the aggressive
  * variant used for matching, not for display.
  *
  * 100 TB shape: a pure narrow map, ONE kernel call per row inside
  * whole-stage codegen (java.text.Normalizer is allocation-light and
  * has an isNormalized fast path that makes already-NFC text — the
  * overwhelming majority of real corpora — a single scan with zero
  * copies). No corpus state, no shuffle.
  *
  * Cross-engine: the NFC path is oracle-verified against DuckDB's
  * nfc_normalize (both implement UAX #15; canonical composition is
  * version-stable for assigned code points); NFKC/NFD/NFKD have no
  * DuckDB twin and are spec-verified.
  */
object UnicodeNormKernel {
  def normalize(text: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, form)) text
    else UTF8String.fromString(java.text.Normalizer.normalize(s, form))
  }
}

/** Per-row Unicode normalization to `formName` ∈ {NFC, NFD, NFKC,
  * NFKD} — one pass, codegen'd.
  */
case class UnicodeNormalizeExpr(child: Expression, formName: String)
  extends UnaryExpression {
  require(Seq("NFC", "NFD", "NFKC", "NFKD").contains(formName),
    s"unknown normalization form $formName")

  @transient private lazy val form = java.text.Normalizer.Form.valueOf(formName)

  // analysis-time type gate (repo discipline): a non-string input
  // fails before a job launches, not as a ClassCastException mid-stage
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires STRING, got ${t.sql}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    UnicodeNormKernel.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.UnicodeNormKernel.normalize(
         |  $c, java.text.Normalizer.Form.$formName);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpr =
    copy(child = newChild)
}

object UnicodeNorm {
  def unicode_normalize(text: Column, form: String): Column =
    Bridge.toColumn(UnicodeNormalizeExpr(Bridge.toExpression(text), form))
}
