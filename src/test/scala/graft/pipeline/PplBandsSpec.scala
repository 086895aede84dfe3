package graft.pipeline

import graft.SparkSpec
import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Semantics of the CCNet-style perplexity banding beyond the oracle
  * hash: bands must be ORDERED by score within every language (the
  * whole point of head/middle/tail), and the cut must be per-language,
  * not global.
  */
class PplBandsSpec extends SparkSpec {

  test("bands are score-ordered within every language and non-trivial") {
    val out = PipelineQueries.qPplBands(spark, sf).cache()
    try {
      // min score of a better band >= max score of a worse band, per lang
      val ranked = out.withColumn("bi",
        when(col("band") === "head", 2)
          .when(col("band") === "middle", 1).otherwise(0))
      val spans = ranked.groupBy(col("lang"), col("bi"))
        .agg(min(col("avg_logp")).as("lo"), max(col("avg_logp")).as("hi"))
        .collect()
        .map(r => (r.getString(0), r.getInt(1)) ->
          (r.getDouble(2), r.getDouble(3))).toMap
      for (((lang, bi), (lo, _)) <- spans; if bi > 0;
           worse <- spans.get((lang, bi - 1))) {
        assert(lo >= worse._2,
          s"$lang band $bi min $lo < band ${bi - 1} max ${worse._2}")
      }
      // terciles on a real corpus populate all three bands somewhere
      val bands = out.select("band").distinct().collect().map(_.getString(0))
      assert(bands.toSet === Set("head", "middle", "tail"))
    } finally out.unpersist()
  }

  test("token-less docs band 'tail' and do not skew the thresholds") {
    import spark.implicits._
    val prose = (1L to 30L).map(i =>
      (i, "en", s"some ordinary words repeated ${"common " * (i.toInt % 5 + 1)}trailer $i"))
    val empties = Seq((100L, "en", ""), (101L, "en", "   "))
    val withEmpties = PipelineQueries.pplBands(
      (prose ++ empties).toDF("doc_id", "lang", "text"))
    val got = withEmpties.collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got(100L) === "tail" && got(101L) === "tail")
    // thresholds unchanged by the sentinel rows: scored docs band
    // identically with and without the empties in the corpus
    val without = PipelineQueries.pplBands(prose.toDF("doc_id", "lang", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    for ((id, b) <- without) assert(got(id) === b, s"doc $id")
  }
}
