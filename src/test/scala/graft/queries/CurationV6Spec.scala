package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for the v6 capstone that the hash oracle cannot
  * state as invariants: the cap really binds, the funnel ordering
  * holds per domain, and the kept stats are consistent with the gate.
  * (The full numeric trajectory is the DuckDB oracle's job —
  * `q_curation_v6` replays all ten classifier training rounds.)
  */
class CurationV6Spec extends SparkSpec {

  private val cap = PipelineQueries.DomainCap
  private lazy val out = PipelineQueries.qCurationV6(spark, sf).cache()

  test("funnel ordering: kept ≤ capped passed ≤ passed ≤ docs, per domain") {
    val bad = out.filter(
      col("n_kept") > col("n_passed") || col("n_passed") > col("n_docs") ||
        col("n_kept") > cap || col("n_kept") < 0)
    assert(bad.count() === 0)
  }

  test("the domain cap binds somewhere and the funnel drops something") {
    val agg = out.agg(
      sum(when(col("n_passed") > cap, 1).otherwise(0)).as("over_cap"),
      sum(col("n_docs")).as("docs"),
      sum(col("n_passed")).as("passed"),
      sum(col("n_kept")).as("kept")).head()
    assert(agg.getLong(0) > 0, "no domain ever exceeded the cap — the " +
      "capping stage is untested at this SF")
    assert(agg.getLong(3) < agg.getLong(2),
      "capping must drop at least one passed doc")
    assert(agg.getLong(2) < agg.getLong(1),
      "the classifier gate must reject at least one doc")
    // every document lands in exactly one domain row
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(agg.getLong(1) === nDocs)
  }

  test("kept stats are zeroed, not NULL, when a domain keeps nothing") {
    assert(out.filter(col("n_kept").isNull || col("toks_kept").isNull ||
      col("mean_score").isNull).count() === 0)
    // and a kept mean score is a valid probability above the gate's
    // 0.5 decision line (only pred=1 docs are ever kept)
    val bad = out.filter(col("n_kept") > 0 &&
      (col("mean_score") < 0.5 || col("mean_score") > 1.0))
    assert(bad.count() === 0)
  }
}
