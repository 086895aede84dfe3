package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Zipf-fit laws: an exact synthetic rank^-1 corpus recovers slope
  * ≈ −1, a uniform-frequency corpus fits slope ≈ 0, and the fit is
  * partitioning-invariant.
  */
class ZipfSpec extends SparkSpec {
  import spark.implicits._

  /** One doc per token occurrence keeps counts exact. */
  private def corpusOf(freqs: Seq[(String, Int)], src: String) =
    freqs.flatMap { case (tok, n) => Seq.fill(n)(tok) }
      .zipWithIndex
      .map { case (tok, i) => (i.toLong, src, tok) }
      .toDF("doc_id", "source", "text")

  private def slopeOf(df: org.apache.spark.sql.DataFrame): Double = {
    val counts = df
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
    val tops = counts.groupBy(col("source"))
      .agg(graft.functions.TopKAgg.top_k_by(col("cnt"),
        TextAnalysis.hash60(col("tok")), 64).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("p", "t")))
      .select((col("p") + 1).cast(LongType).as("rank"), col("t.ord").as("cnt"))
    val pts = tops.select(
      log(col("rank").cast(DoubleType)).as("x"),
      log(col("cnt").cast(DoubleType)).as("y")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    (n * sxy - sx * sy) / (n * sxx - sx * sx)
  }

  test("exact rank^-1 frequencies fit slope ~ -1") {
    // token k has count round(600/k): a clean Zipf head
    val freqs = (1 to 40).map(k => (s"tok$k", math.round(600.0 / k).toInt))
    val s = slopeOf(corpusOf(freqs, "zipfy"))
    assert(s < -0.9 && s > -1.1, s"slope $s should be ~ -1")
  }

  test("uniform frequencies fit slope ~ 0") {
    val freqs = (1 to 40).map(k => (s"tok$k", 15))
    val s = slopeOf(corpusOf(freqs, "flat"))
    assert(math.abs(s) < 0.05, s"slope $s should be ~ 0")
  }

  test("query slope is partitioning-invariant on real data") {
    def run(p: Int) = {
      val docs = spark.read.parquet(s"$sf/documents.parquet").repartition(p)
      val counts = docs
        .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cnt"))
      counts.groupBy(col("source"))
        .agg(graft.functions.TopKAgg.top_k_by(col("cnt"),
          TextAnalysis.hash60(col("tok")), 64).as("top"))
        .select(col("source"), col("top"))
        .orderBy("source").collect().map(_.toSeq).toSeq
    }
    assert(run(2) === run(7))
  }
}
