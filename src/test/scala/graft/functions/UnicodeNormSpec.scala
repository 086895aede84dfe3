package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unicode-normalization kernel pins: NFC composes canonical
  * equivalents, NFKC additionally folds compatibility forms
  * (ligature, fullwidth), NFD is NFC's inverse on these cases,
  * idempotence, NULL and astral-plane safety.
  */
class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._
  import UnicodeNorm.unicode_normalize

  private def norm(form: String, ss: String*): Seq[String] =
    ss.toDF("t").select(unicode_normalize(col("t"), form))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("NFC composes; byte-different spellings land on one string") {
    val composed = "café"
    val decomposed = "café"
    assert(composed !== decomposed)
    assert(norm("NFC", composed, decomposed).distinct === Seq(composed))
  }

  test("NFKC folds compatibility forms NFC must preserve") {
    val ligature = "ﬁle"      // ﬁle
    val fullwidth = "ＡＢ" // ＡＢ
    assert(norm("NFKC", ligature, fullwidth) === Seq("file", "AB"))
    assert(norm("NFC", ligature, fullwidth) === Seq(ligature, fullwidth))
  }

  test("NFD decomposes what NFC composes; both are idempotent") {
    val composed = "café"
    val decomposed = "café"
    assert(norm("NFD", composed) === Seq(decomposed))
    assert(norm("NFC", norm("NFC", decomposed).head) === Seq(composed))
    assert(norm("NFD", norm("NFD", composed).head) === Seq(decomposed))
  }

  test("nulls pass through; astral-plane text survives untouched") {
    val astral = "😀 ok 🍕" // 😀 ok 🍕
    val got = Seq((1L, astral), (2L, null))
      .toDF("id", "t").orderBy("id")
      .select(unicode_normalize(col("t"), "NFC"))
      .collect()
    assert(got(0).getString(0) === astral)
    assert(got(1).isNullAt(0))
  }

  test("unknown form is rejected at construction") {
    intercept[IllegalArgumentException] {
      Seq("x").toDF("t").select(unicode_normalize(col("t"), "NFX")).collect()
    }
  }
}
