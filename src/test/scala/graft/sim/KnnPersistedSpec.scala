package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Persisted-graph serving laws: the store reproduces the in-query
  * graph bit-for-bit, a fresh ensure over the unchanged corpus
  * REUSES (no rebuild), and a corpus change invalidates.
  */
class KnnPersistedSpec extends SparkSpec {
  import graft.dedup.IncrementalDedup.ensureBucketedState

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")
  private lazy val nodes = emb.filter(col("vec_id") % 4 === 0)
    .select(col("vec_id"), col("embedding"))
  private def sig = nodes.select(col("vec_id"),
    col("embedding").cast(StringType).as("sig"))

  test("served graph ≡ in-query graph; reuse and invalidation laws") {
    val table = "graft_knn_spec_store"
    val rebuilt1 = ensureBucketedState(sig, "vec_id", "sig", table, 4,
      Seq("src"), Seq("src"))(
      KnnGraph.build(nodes, "vec_id", "embedding", 3, 2, 4))
    assert(rebuilt1, "first ensure must build")
    val served = spark.table(table)
      .orderBy("src", "rank").collect().map(_.toSeq).toSeq
    val direct = KnnGraph.build(nodes, "vec_id", "embedding", 3, 2, 4)
      .orderBy("src", "rank").collect().map(_.toSeq).toSeq
    assert(served === direct)
    // unchanged corpus → reuse, no rebuild
    val rebuilt2 = ensureBucketedState(sig, "vec_id", "sig", table, 4,
      Seq("src"), Seq("src"))(
      sys.error("build thunk must not run on reuse"))
    assert(!rebuilt2)
    // corpus change → invalidate and rebuild (build thunk runs)
    val fewer = nodes.filter(col("vec_id") % 8 === 0)
    val rebuilt3 = ensureBucketedState(
      fewer.select(col("vec_id"), col("embedding").cast(StringType).as("sig")),
      "vec_id", "sig", table, 4, Seq("src"), Seq("src"))(
      KnnGraph.build(fewer, "vec_id", "embedding", 3, 2, 4))
    assert(rebuilt3, "changed corpus must rebuild")
  }
}
