package graft

import graft.dedup.Dedup
import graft.functions.{BloomContainsExpr, DotFold, KMinDistinct, MinHashSig, MisraGries, ShingleHashes, SimHashExpr, ToNumber, TopKBy}
import graft.text.TextAnalysis
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.Bridge

/** SQL surface for the engine's functions, injected through the
  * sanctioned `SparkSessionExtensions` hook:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   // or on an existing session:
  *   graft.GraftExtensions.register(spark)
  *   spark.sql("SELECT to_number(value), minhash_sig(shingle_hashes(text)) FROM docs")
  * }}}
  *
  * Native expressions (ToNumber, ShingleHashes, MinHashSig, DotFold)
  * bind directly; Column-level functions (fingerprints, quality score,
  * language id) bind through the same composition used by the Scala
  * API, so SQL and DataFrame callers get identical semantics.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  /** Lift a Column→Column function into an expression builder. Eager
    * conversion is required on the way out: the SQL path hands the
    * builder's result straight to the optimizer, which never unwraps
    * the lazy ColumnNodeExpression the DataFrame path tolerates.
    */
  private def lift1(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Seq[Expression] => Expression =
    args => Bridge.toEagerExpression(f(Bridge.toColumn(args.head)))

  private def lift2(name: String,
      f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => Bridge.toEagerExpression(
      f(Bridge.toColumn(a), Bridge.toColumn(b)))
    case args => throw new IllegalArgumentException(
      s"$name takes exactly 2 arguments, got ${args.length}")
  }

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val descriptors: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("to_number",
      info("to_number", "to_number(str[, precision, scale]) - lenient comma-grouped numeric parse (PG to_number semantics; non-numeric → NULL)"),
      args => args match {
        case Seq(c) => ToNumber(c)
        case Seq(c, p, s) => ToNumber(c, intArg(p, "precision"), intArg(s, "scale"))
        case _ => throw new IllegalArgumentException(
          "to_number(str[, precision, scale])")
      }),
    ("shingle_hashes",
      info("shingle_hashes", "shingle_hashes(text[, w]) - distinct hashed word w-shingles (default w=3)"),
      args => args match {
        case Seq(c) => ShingleHashes(c, 3, Dedup.P)
        case Seq(c, w) => ShingleHashes(c, intArg(w, "w"), Dedup.P)
        case _ => throw new IllegalArgumentException("shingle_hashes(text[, w])")
      }),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(grams) - 16-permutation MinHash signature of a shingle-hash array"),
      args => MinHashSig(args.head,
        Dedup.minhashCoeffs.map(_._1), Dedup.minhashCoeffs.map(_._2), Dedup.P)),
    ("dot_fold",
      info("dot_fold", "dot_fold(a, b) - left-to-right double dot product of two float/double arrays"),
      args => DotFold(args(0), args(1))),
    ("simhash",
      info("simhash", "simhash(text) - 60-bit SimHash fingerprint of the whitespace token stream"),
      args => SimHashExpr(args.head, Dedup.simhashBits)),
    ("k_min_distinct",
      info("k_min_distinct", "k_min_distinct(col, k) - aggregate: the k smallest distinct int64 values, ascending (KMV sketch registers)"),
      args => KMinDistinct(args.head, intArg(args(1), "k"))),
    ("top_k_by",
      info("top_k_by", "top_k_by(ord, payload, k) - aggregate: the k best (ord DESC, payload ASC) int64 pairs per group as array<struct<ord,payload>> (bounded heap, no window sort)"),
      args => TopKBy(args(0), args(1), intArg(args(2), "k"))),
    ("misra_gries",
      info("misra_gries", "misra_gries(col, k) - aggregate: ≤k Misra-Gries heavy-hitter candidate counters as array<struct<item,weight>> (superset of items with freq > N/(k+1) under any merge order)"),
      args => MisraGries(args.head, intArg(args(1), "k"))),
    ("bloom_contains",
      info("bloom_contains", "bloom_contains(key, words, mBits) - membership of key in a graft.sketch.Bloom dense word array (array<bigint> literal)"),
      args => args match {
        case Seq(c, w, m) =>
          // the builder runs mid-analysis: array(1L, 2L, …) arrives as
          // a resolved-but-unfolded CreateArray, so accept any foldable
          // array expression and evaluate it once here
          val words = w match {
            case e if e.resolved && e.foldable &&
                e.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] =>
              e.eval().asInstanceOf[
                org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
            case other => throw new IllegalArgumentException(
              s"words must be a foldable array<bigint>, got $other")
          }
          BloomContainsExpr(c, words, intArg(m, "mBits"),
            graft.sketch.Bloom.probeCoeffs.map(_._1),
            graft.sketch.Bloom.probeCoeffs.map(_._2),
            graft.sketch.Bloom.P)
        case _ => throw new IllegalArgumentException(
          "bloom_contains(key, words, mBits)")
      }),
    ("fingerprint_hex",
      info("fingerprint_hex", "fingerprint_hex(text) - md5 hex of normalized content"),
      lift1(TextAnalysis.fingerprintHex)),
    ("fingerprint60",
      info("fingerprint60", "fingerprint60(text) - portable 60-bit integer fingerprint of normalized content"),
      lift1(TextAnalysis.fingerprint60)),
    ("quality_score",
      info("quality_score", "quality_score(text) - composite [0,1] document quality score"),
      lift1(TextAnalysis.qualityScore)),
    ("lang_id",
      info("lang_id", "lang_id(text) - marker-word language id ('und' when no markers hit)"),
      lift1(TextAnalysis.langId)),
    ("token_count",
      info("token_count", "token_count(text) - whitespace token count"),
      lift1(TextAnalysis.tokenCount)),
    ("z_value",
      info("z_value", "z_value(x, y) - Morton bit-interleave of two non-negative ints (16 bits each) for z-order clustering"),
      lift2("z_value", graft.ops.ZOrder.zValue(_, _))))

  /** Register the same functions into an ALREADY-RUNNING session (the
    * extensions hook only fires at session construction).
    */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), inf, builder)
    }
}
