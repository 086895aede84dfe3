package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SoftDedup laws: exact copies share one cluster and split its unit
  * of weight; near-dups (suffixed copy) join the cluster through LSH;
  * singletons keep weight 1; total expected mass = #clusters; and the
  * weights are partitioning-invariant.
  */
class SoftDedupSpec extends SparkSpec {
  import spark.implicits._

  private val body = "the quick brown fox jumps over the lazy dog " +
    "while seven wizards brew quartz potions beyond the misty fjord " +
    "and every sphinx of black quartz judges my vow"
  private lazy val docs = Seq(
    (1L, body), (2L, body), (3L, body),                  // exact ×3
    (4L, body + " trailing marker appended here"),       // near-dup
    (5L, "completely different unrelated text about spark catalyst " +
      "optimizer rules and tungsten code generation pipelines"),
    (6L, "another standalone document mentioning parquet footers and " +
      "column statistics for predicate pushdown at scan time"))
    .toDF("doc_id", "text")

  // (doc_id, cluster_id, csize, weight)
  private lazy val w = Dedup.softDedupWeights(docs, "doc_id", "text")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("copies and near-dup share one cluster; weight = 1/csize") {
    val cluster1 = w.filter(r => Seq(1L, 2L, 3L, 4L).contains(r._1))
    assert(cluster1.map(_._2).distinct.length === 1,
      s"docs 1-4 should share a cluster: $cluster1")
    assert(cluster1.forall(_._3 === 4L))
    assert(cluster1.forall(_._4 === 0.25))
  }

  test("singletons keep weight 1.0") {
    val singles = w.filter(r => Seq(5L, 6L).contains(r._1))
    assert(singles.forall(_._3 === 1L))
    assert(singles.forall(_._4 === 1.0))
  }

  test("total expected mass equals the number of clusters") {
    val total = w.map(_._4).sum
    val nClusters = w.map(_._2).distinct.length
    assert(math.abs(total - nClusters) < 1e-9)
  }

  test("partitioning invariance") {
    def run(p: Int) = Dedup.softDedupWeights(docs.repartition(p),
      "doc_id", "text").orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(run(2) === run(5))
  }
}
