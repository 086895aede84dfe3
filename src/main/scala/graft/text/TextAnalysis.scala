package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, quality scoring, language ID, fingerprinting. All are
  * composed from codegen'd builtins (no UDFs) so they run inside
  * whole-stage codegen and scale linearly with input — the 100 TB path
  * is a single narrow map stage, no shuffle.
  *
  * Numeric outputs are rounded to fixed decimals so results are
  * reproducible across engines (oracle parity).
  */
object TextAnalysis {

  /** Whitespace tokens; empty/blank text → empty array (Spark split of
    * "" yields [""], which we filter).
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Joined-string word n-grams ("w1 w2 … wn") of the text — the
    * [[graft.text.BigramLm]] bigram construction generalized: the
    * token array is let-bound via a single-element transform so the
    * tokenizer runs once per row, and texts with fewer than n tokens
    * yield an empty list (never a counted-down sequence).
    */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1)
    element_at(
      transform(array(tokens(text)), t =>
        transform(
          when(size(t) >= n, sequence(lit(1), size(t) - (n - 1)))
            .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.IntegerType))),
          i => concat_ws(" ",
            (0 until n).map(o => element_at(t, i + o)): _*))),
      1)
  }

  /** BPE-ish subword token estimate: chars/4 rounded up — the standard
    * budget heuristic when no tokenizer is available.
    */
  def subwordEstimate(text: Column): Column =
    ceil(length(text).cast(DoubleType) / 4.0).cast(LongType)

  /** 60-bit integer hash from md5 — portable across engines (DuckDB:
    * cast('0x'||substr(md5(s),1,15) as bigint)). 15 hex digits keeps it
    * positive in a signed 64-bit long.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Whitespace tokens hashed to 60-bit ints mod 2^31-1 — set-dedup
    * operators ([[graft.dedup.AllPairs]]) shuffle these longs instead
    * of the token strings. DuckDB mirror: hash60Sql(tok) % 2147483647.
    */
  def tokensHashed(text: Column): Column =
    transform(tokens(text), t => hash60(t) % 2147483647L)

  /** Canonical text normalization for fingerprint/dedup: lowercase,
    * collapse whitespace runs, trim.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint of the normalized text (md5 hex + 60-bit int). */
  def fingerprintHex(text: Column): Column = md5(normalize(text))
  def fingerprint60(text: Column): Column = hash60(normalize(text))

  val defaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from")

  /** Ratio helpers (denominator-guarded, rounded for reproducibility). */
  private def ratio(num: Column, den: Column, nd: Int = 6): Column =
    round(when(den > 0, num.cast(DoubleType) / den.cast(DoubleType))
      .otherwise(lit(0.0)), nd)

  /** Stopword ratio over whitespace tokens. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    ratio(size(filter(toks, t => t.isin(stopwords: _*))), size(toks))
  }

  /** Fraction of characters that are not [a-z0-9 ] after lowering. */
  def punctRatio(text: Column): Column =
    ratio(length(regexp_replace(lower(text), "[a-z0-9 ]", "")), length(text))

  /** Fraction of characters that are digits. */
  def digitRatio(text: Column): Column =
    ratio(length(regexp_replace(text, "[^0-9]", "")), length(text))

  /** Mean token length (chars of non-space content / token count). */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    ratio(length(regexp_replace(text, "\\s", "")), size(toks))
  }

  /** Composite document quality score in [0,1] — the standard
    * length/stopword/punctuation gate used for corpus filtering:
    * reward presence of stopwords (natural prose), penalize
    * punctuation-heavy or digit-heavy text and degenerate token lengths.
    *
    * Native one-pass kernel (graft.functions.QualityScoreExpr): the
    * composed form re-tokenizes per ratio term (interpreted HOFs,
    * no subtree sharing within one expression) — ~5 tokenizer passes
    * per row. Bit-identical to [[qualityScoreComposed]]
    * (TextFeaturesSpec).
    */
  def qualityScore(text: Column): Column =
    graft.functions.TextFeatures.quality_score(text)

  /** Builtin-composed twin of [[qualityScore]], kept as the kernel's
    * spec cross-check (and the form the oracle SQL mirrors).
    */
  private[graft] def qualityScoreComposed(text: Column): Column = {
    val lenTerm = least(tokenCount(text).cast(DoubleType) / 100.0, lit(1.0))
    val stopTerm = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punctTerm = greatest(lit(1.0) - punctRatio(text) * 4.0, lit(0.0))
    val digitTerm = greatest(lit(1.0) - digitRatio(text) * 4.0, lit(0.0))
    round((lenTerm + stopTerm + punctTerm + digitTerm) / 4.0, 6)
  }

  /** Intra-document repetition ratio (Gopher/MassiveText-style quality
    * signal): 1 − distinct/total word w-shingles — 0 for fully novel
    * text, approaching 1 for a document that repeats one phrase.
    * Shingles are counted via the portable hash kernel (collisions
    * undercount distinct shingles with probability ~positions²/2³¹ —
    * negligible, deterministic, and mirrored exactly by the oracle).
    */
  def repetitionRatio(text: Column, w: Int = 3): Column = {
    val positions = greatest(tokenCount(text) - (w - 1), lit(0))
    val distinctShingles =
      size(graft.functions.TextHashes.shingle_hashes(text, w, graft.dedup.Dedup.P))
    round(when(positions > 0,
      lit(1.0) - distinctShingles.cast(DoubleType) / positions.cast(DoubleType))
      .otherwise(lit(0.0)), 6)
  }

  /** PII scrub patterns, applied in order (emails before phones so the
    * digits of an address-like local part aren't half-matched). POSIX-
    * compatible regexes — identical semantics in Spark and DuckDB's
    * regexp_replace(…, 'g').
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "[0-9]{3}-[0-9]{2}-[0-9]{4}" -> "<SSN>",
    "\\+?[0-9]{1,3}[-. ]?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}" -> "<PHONE>",
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}" -> "<IP>")

  /** Redact PII spans (emails, SSNs, phones, IPv4s) with typed
    * placeholders — the standard scrub stage of a training-data
    * pipeline. Pure regexp_replace chain: codegen'd, order-fixed,
    * reproducible cross-engine.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** PII-span count: independent per-pattern match counts on the RAW
    * text (one regexp_extract_all scan per pattern, no re-derivation of
    * the redacted string — the staged-expression discipline).
    */
  def piiCount(text: Column): Column =
    piiPatterns.map { case (pat, _) =>
      size(regexp_extract_all(text, lit(pat), lit(0)))
    }.reduce(_ + _).cast(IntegerType)

  /** Language marker words: tiny per-language stopword seed sets for the
    * n-gram-free heuristic. Deterministic and portable; accuracy depends
    * on markers, mechanism is what the engine provides.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "des", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Per-language marker-hit score. */
  def langScore(text: Column, markers: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(markers: _*)))

  /** Predicted language = argmax of marker scores; 'und' when all zero.
    * Tie-break = marker list order (first wins), deterministic.
    *
    * Native one-pass kernel (graft.functions.LangIdExpr): the composed
    * CASE chain instantiates the tokenizer once per score AND once per
    * comparison (~10 interpreted passes per row). Bit-identical to
    * [[langIdComposed]] (TextFeaturesSpec).
    */
  def langId(text: Column): Column =
    graft.functions.TextFeatures.lang_id(text)

  /** Builtin-composed twin of [[langId]], kept as the kernel's spec
    * cross-check (and the form the oracle SQL mirrors).
    *
    * Null-propagating like the kernel: without the isNull guard the
    * when-chain's null score comparisons would fall through to the
    * 'und' default, so the twins would disagree on null text (NULL vs
    * 'und') for any caller grouping by language even though gate
    * FILTERS behave identically (both fail `=== lang`).
    */
  private[graft] def langIdComposed(text: Column): Column = {
    val scores = langMarkers.map { case (lang, ms) => lang -> langScore(text, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val composed = scores.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    when(text.isNull, lit(null).cast("string")).otherwise(composed)
  }
}
