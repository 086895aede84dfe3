package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.Row

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  test("planted semantic near-dups drop to the senior representative") {
    // one tight blob (ids 0-4, pairwise cosine ≈ 1) + far-apart
    // singletons; within the blob only id 0 — the senior — survives
    val blob = (0L until 5L).map(i =>
      (i, Seq(1.0f, 1f, 1f, 1f).map(_ + (i % 5) * 0.001f)))
    val solo = Seq(
      (10L, Seq(5.0f, -5f, 5f, -5f)),
      (11L, Seq(-5.0f, 5f, -5f, 5f)))
    val df = (blob ++ solo).toDF("vec_id", "embedding")
    val out = SemDedup.semDedup(df, "vec_id", "embedding",
      k = 3, iters = 2, tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(0L), "senior blob member must be kept")
    assert((1L until 5L).forall(i => !out(i)), "junior blob members drop")
    assert(out(10L) && out(11L), "singletons survive")
  }

  test("one row per input, max_dup_sim null iff kept") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = SemDedup.semDedup(emb, "vec_id", "embedding",
      k = 8, iters = 3, tau = 0.3).collect()
    assert(out.length == emb.count())
    out.foreach { case Row(_, _, kept: Boolean, sim) =>
      assert(kept == (sim == null))
    }
  }

  test("tau = -1 keeps only the senior per cluster; tau > 1 keeps all") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(100)
    val all = SemDedup.semDedup(emb, "vec_id", "embedding",
      k = 4, iters = 2, tau = 1.5)
    assert(all.filter("NOT kept").count() == 0)
    // cosine ≥ -1 always: exactly one survivor (the min id) per cluster
    val one = SemDedup.semDedup(emb, "vec_id", "embedding",
      k = 4, iters = 2, tau = -1.0)
    val survivors = one.filter("kept").collect()
      .map(r => r.getInt(1)).toSeq
    assert(survivors.size == survivors.distinct.size)
    val seniors = one.groupBy("cluster").agg(
      org.apache.spark.sql.functions.min("vec_id").as("mn")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val keptIds = one.filter("kept").collect()
      .map(r => (r.getInt(1), r.getLong(0))).toMap
    assert(keptIds == seniors)
  }
}
