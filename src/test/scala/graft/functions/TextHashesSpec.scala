package graft.functions

import graft.SparkSpec
import graft.dedup.Dedup
import graft.text.TextAnalysis
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The native kernels must be BIT-IDENTICAL to the composed-builtin
  * pipelines they replace — same tokenizer, same md5→60-bit hash, same
  * fold order. Each test evaluates both forms side by side.
  */
class TextHashesSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "", "one", "two words", "exactly three tokens",
    "  leading and  trailing   whitespace  ",
    "tabs\tand\nnewlines separate tokens too",
    "unicode: caffè 中文 emoji éè",
    "repeat repeat repeat repeat repeat repeat"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  /** The pre-kernel builtin shingle pipeline (kept here as the spec). */
  private def builtinShingles(text: Column, w: Int = 3): Column =
    element_at(
      transform(array(TextAnalysis.tokens(text)), t =>
        array_distinct(transform(
          when(size(t) >= w, sequence(lit(1), size(t) - (w - 1)))
            .otherwise(array().cast(ArrayType(IntegerType))),
          i => TextAnalysis.hash60(
            concat_ws(" ", (0 until w).map(o => element_at(t, i + o)): _*)) % Dedup.P))),
      1)

  private def builtinSig(shingles: Column): Column = {
    val cs = Dedup.minhashCoeffs
    val aLit = array(cs.map(c => lit(c._1)): _*)
    val bLit = array(cs.map(c => lit(c._2)): _*)
    val idx = array(cs.indices.map(i => lit(i)): _*)
    val init = array(Seq.fill(cs.size)(lit(Dedup.P)): _*)
    aggregate(shingles, init, (acc, x) =>
      zip_with(acc, idx, (m, i) =>
        least(m, (x * element_at(aLit, i + 1) + element_at(bLit, i + 1)) % Dedup.P)))
  }

  private def builtinDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  test("ShingleHashes kernel equals the builtin md5 pipeline") {
    val df = texts.toDF("id", "text")
    val diff = df.select(
      TextHashes.shingle_hashes($"text", 3, Dedup.P).as("k"),
      builtinShingles($"text").as("b"))
      .filter(not($"k" <=> $"b"))
    assert(diff.count() === 0)
  }

  test("MinHashSig kernel equals the builtin fold") {
    val df = texts.toDF("id", "text")
      .select($"id", TextHashes.shingle_hashes($"text", 3, Dedup.P).as("g"))
    val diff = df.select(
      TextHashes.minhash_sig($"g", Dedup.minhashCoeffs, Dedup.P).as("k"),
      builtinSig($"g").as("b"))
      .filter(not($"k" <=> $"b"))
    assert(diff.count() === 0)
  }

  test("DotFold kernel equals the builtin fold bit-for-bit (float and double)") {
    val vecs = (0 until 20).map { i =>
      (i.toLong, Array.tabulate(64)(j => (math.sin(i * 31 + j) * 3).toFloat))
    }.toDF("id", "v")
    val withPlane = vecs.withColumn("p",
      array((0 until 64).map(j => lit(graft.sim.Ann.hyperplane(2, 64)(j))): _*))
    val diff = withPlane.select(
      TextHashes.dot_fold($"v", $"v").as("k1"), builtinDot($"v", $"v").as("b1"),
      TextHashes.dot_fold($"v", $"p").as("k2"), builtinDot($"v", $"p").as("b2"))
      .filter(not($"k1" <=> $"b1") || not($"k2" <=> $"b2"))
    assert(diff.count() === 0)
  }

  test("SimHash kernel equals the builtin vote fold") {
    val df = texts.toDF("id", "text")
    val diff = df.select(
      Dedup.simhash($"text").as("k"),
      Dedup.simhashComposed($"text").as("b"))
      .filter(not($"k" <=> $"b"))
    assert(diff.count() === 0)
    // and on real corpus text
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val diff2 = docs.select(
      Dedup.simhash($"text").as("k"),
      Dedup.simhashComposed($"text").as("b"))
      .filter(not($"k" <=> $"b"))
    assert(diff2.count() === 0)
  }

  test("SignBuckets kernel equals the composed per-plane sign chain") {
    import graft.sim.Ann
    val numTables = 3
    val numPlanes = 12
    val dim = 64
    val allPlanes = (0 until numTables * numPlanes).map(Ann.hyperplane(_, dim))
    // the pre-kernel composed form: per table, a concat of
    // when(dotFold >= 0) signs, prefixed with the table index
    def composed(vec: Column): Column = array((0 until numTables).map { t =>
      val signs = (0 until numPlanes).map { i =>
        val p = allPlanes(t * numPlanes + i)
        when(TextHashes.dot_fold(vec, array(p.map(lit): _*)) >= 0, lit("1"))
          .otherwise(lit("0"))
      }
      concat_ws("_", lit(t), concat(signs: _*))
    }: _*)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val diff = emb.select(
      TextHashes.sign_buckets($"embedding", allPlanes, numTables,
        withPrefix = true).as("k"),
      composed($"embedding").as("b"))
      .filter(not($"k" <=> $"b"))
    assert(diff.count() === 0)
    // null vector and wrong-dimension vector both degrade to the
    // all-zeros pattern in BOTH forms (null dot falls through to '0')
    val edge = Seq(
      (1L, null.asInstanceOf[Array[Float]]),
      (2L, Array(1.0f, -2.0f))).toDF("id", "embedding")
    val edgeRows = edge.select(
      TextHashes.sign_buckets($"embedding", allPlanes, numTables,
        withPrefix = true).as("k"),
      composed($"embedding").as("b")).collect()
    edgeRows.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
      assert(r.getSeq[String](0) === (0 until numTables).map(t => s"${t}_" + "0" * numPlanes))
    }
  }

  test("kernels behave on edge inputs: null text, empty arrays") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("id", "text")
    val out = df.select(
      TextHashes.shingle_hashes($"text", 3, Dedup.P).as("g"))
      .withColumn("s", TextHashes.minhash_sig($"g", Dedup.minhashCoeffs, Dedup.P))
      .collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))       // null text
    assert(out(1).getSeq[Long](0).isEmpty)                 // empty text
    assert(out(1).getSeq[Long](1).forall(_ == Dedup.P))    // sentinel sig
  }
}
