package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

/** Semantic-decontamination laws: planted near-copies of eval items
  * are all flagged with the right nearest id, the natural corpus
  * stays clean at τ, exact copies score 1.0, and the report is
  * partitioning-invariant.
  */
class SemanticDecontamSpec extends SparkSpec {
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private lazy val evalSet = emb.filter(col("vec_id") % 13 === 0)
    .select(col("vec_id"), col("embedding"))

  test("planted near-copies are flagged with their source as nearest") {
    val planted = evalSet.select((col("vec_id") + 1000000L).as("vec_id"),
      concat(
        array((element_at(col("embedding"), 1) + lit(0.125f)).cast(FloatType)),
        slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = emb.filter(col("vec_id") % 13 =!= 0)
      .select(col("vec_id"), col("embedding")).union(planted)
    val rep = SemanticDecontam.report(corpus, evalSet,
      "vec_id", "embedding", tau = 0.9).cache()
    val flagged = rep.filter(col("contaminated")).collect()
    assert(flagged.nonEmpty)
    // every flagged row is a planted one, and vice versa
    assert(flagged.forall(_.getAs[Long]("id") >= 1000000L))
    assert(flagged.length === planted.count())
    flagged.foreach { r =>
      assert(r.getAs[Long]("nearest_eval") === r.getAs[Long]("id") - 1000000L)
      assert(r.getAs[Double]("max_sim") > 0.99)
    }
    rep.unpersist()
  }

  test("exact copies score max_sim = 1.0") {
    val copies = evalSet.select((col("vec_id") + 5000L).as("vec_id"),
      col("embedding"))
    val rep = SemanticDecontam.report(copies, evalSet,
      "vec_id", "embedding", tau = 0.9)
    assert(rep.filter(col("max_sim") < 1.0).count() === 0)
    assert(rep.filter(!col("contaminated")).count() === 0)
  }

  test("partitioning invariance") {
    def run(p: Int) = SemanticDecontam.report(
      emb.filter(col("vec_id") % 13 =!= 0).repartition(p),
      evalSet, "vec_id", "embedding", tau = 0.9)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(run(2) === run(7))
  }

  test("streaming gate passes exactly the batch report's clean set") {
    val planted = evalSet.select((col("vec_id") + 1000000L).as("vec_id"),
      concat(
        array((element_at(col("embedding"), 1) + lit(0.125f)).cast(FloatType)),
        slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = emb.filter(col("vec_id") % 13 =!= 0)
      .select(col("vec_id"), col("embedding")).union(planted)
    val gated = graft.streaming.EventStreams.semanticGateStream(
        corpus, "embedding", evalSet, "embedding", tau = 0.9)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val clean = SemanticDecontam.report(corpus, evalSet,
        "vec_id", "embedding", tau = 0.9)
      .filter(!col("contaminated"))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(gated === clean)
    assert(gated.nonEmpty && !gated.exists(_ >= 1000000L))
  }
}
