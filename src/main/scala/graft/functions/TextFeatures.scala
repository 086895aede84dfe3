package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass kernels for the corpus-gate hot path: language ID
  * and quality score.
  *
  * The composed-builtin forms are correct but instantiate the
  * whitespace tokenizer (an interpreted higher-order `filter(split…)`)
  * once per marker list / ratio term — inside `langId` + `qualityScore`
  * a single Filter condition re-tokenizes each row ~14×, and Catalyst
  * cannot share subtrees within one expression. These kernels tokenize
  * ONCE and derive every count in the same pass, stay inside
  * whole-stage codegen, and replicate the builtin arithmetic
  * bit-for-bit (same split regex, same first-wins argmax, same
  * HALF_UP double rounding Spark's Round uses) — proven by
  * TextFeaturesSpec against the composed twins.
  */
object TextFeatureKernels {

  /** Spark Round(double, scale) semantics: BigDecimal.valueOf +
    * HALF_UP (RoundBase codegen for DoubleType).
    */
  private def round6(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark lower() semantics (UTF8String.toLowerCase): locale-FREE
    * byte-wise A-Z mapping when the string is pure ASCII, default-
    * locale String.toLowerCase otherwise. Plain s.toLowerCase would
    * diverge on tr/az-locale JVMs for ASCII 'I' (→ dotless ı).
    */
  private def lowerLikeSpark(s: String): String = {
    var i = 0
    var ascii = true
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) { ascii = false; i = s.length } else i += 1
    }
    if (!ascii) return s.toLowerCase
    val out = new Array[Char](s.length)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      out(i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      i += 1
    }
    new String(out)
  }

  /** Marker-hit counts per language, in [[langs]] order, plus token
    * and stopword counts — one tokenizer pass for everything.
    */
  private def counts(text: String): (Int, Int, Array[Int]) = {
    val raw = text.split("\\s+")
    var nTok = 0
    var nStop = 0
    val marks = new Array[Int](langSets.length)
    var i = 0
    while (i < raw.length) {
      val t = raw(i)
      if (!t.isEmpty) {
        nTok += 1
        if (stopSet.contains(t)) nStop += 1
        var l = 0
        while (l < langSets.length) {
          if (langSets(l).contains(t)) marks(l) += 1
          l += 1
        }
      }
      i += 1
    }
    (nTok, nStop, marks)
  }

  // single-sourced from TextAnalysis so the oracle SQL (generated from
  // the same constants) stays in lockstep
  private lazy val langs: Array[String] =
    graft.text.TextAnalysis.langMarkers.map(_._1).toArray
  private lazy val langSets: Array[java.util.HashSet[String]] =
    graft.text.TextAnalysis.langMarkers.map { case (_, ms) =>
      val s = new java.util.HashSet[String]()
      ms.foreach(s.add)
      s
    }.toArray
  private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.text.TextAnalysis.defaultStopwords.foreach(s.add)
    s
  }

  /** Argmax language with first-wins tie-break; "und" when no marker
    * hits — identical to the composed CASE chain.
    */
  def langId(text: UTF8String): UTF8String = {
    val (_, _, marks) = counts(text.toString)
    var best = 0
    var l = 0
    while (l < marks.length) { if (marks(l) > best) best = marks(l); l += 1 }
    if (best == 0) return UTF8String.fromString("und")
    l = 0
    while (l < marks.length) {
      if (marks(l) == best) return UTF8String.fromString(langs(l))
      l += 1
    }
    UTF8String.fromString("und") // unreachable
  }

  /** Composite quality score — term-for-term the composed form:
    * lenTerm   = least(nTok/100, 1)
    * stopTerm  = least(round6(stopRatio)·4, 1)
    * punctTerm = greatest(1 − round6(punctRatio)·4, 0)
    * digitTerm = greatest(1 − round6(digitRatio)·4, 0)
    * result    = round6(sum/4); ratios 0 when the denominator is 0.
    */
  def qualityScore(text: UTF8String): Double = {
    val s = text.toString
    val (nTok, nStop, _) = counts(s)
    // code-point counts mirror Spark length()/regexp_replace residue
    // counting (a non-matching surrogate pair is one code point)
    val lowered = lowerLikeSpark(s)
    var nPunct = 0
    var i = 0
    while (i < lowered.length) {
      val cp = lowered.codePointAt(i)
      val keep = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') || cp == ' '
      if (!keep) nPunct += 1
      i += Character.charCount(cp)
    }
    var nChars = 0
    var nDigit = 0
    i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      nChars += 1
      if (cp >= '0' && cp <= '9') nDigit += 1
      i += Character.charCount(cp)
    }
    def ratio(num: Int, den: Int): Double =
      if (den > 0) round6(num.toDouble / den.toDouble) else 0.0
    val lenTerm = math.min(nTok.toDouble / 100.0, 1.0)
    val stopTerm = math.min(ratio(nStop, nTok) * 4.0, 1.0)
    // punct ratio denominates by length(text) like the builtin, but
    // counts the residue of lower(text) — keep both counts
    val punctTerm = math.max(1.0 - ratio(nPunct, nChars) * 4.0, 0.0)
    val digitTerm = math.max(1.0 - ratio(nDigit, nChars) * 4.0, 0.0)
    round6((lenTerm + stopTerm + punctTerm + digitTerm) / 4.0)
  }
}

/** Predicted language of a text column (one tokenizer pass). */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TextFeatureKernels.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextFeatureKernels.langId($c);")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** Composite quality score of a text column (one tokenizer pass). */
case class QualityScoreExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    TextFeatureKernels.qualityScore(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextFeatureKernels.qualityScore($c);")

  override protected def withNewChildInternal(newChild: Expression): QualityScoreExpr =
    copy(child = newChild)
}

object TextFeatures {
  def lang_id(text: Column): Column =
    Bridge.toColumn(LangIdExpr(Bridge.toExpression(text)))
  def quality_score(text: Column): Column =
    Bridge.toColumn(QualityScoreExpr(Bridge.toExpression(text)))
}
