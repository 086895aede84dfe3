package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  test("sharded rank equals the global row_number, any shard count") {
    val df = (0 until 500)
      .map(i => (i.toLong, f"k${(i * 37) % 101}%03d-$i"))
      .toDF("id", "k")
    val expect = df
      .withColumn("r", row_number().over(
        Window.orderBy(col("k"), col("id"))).cast("long") - 1L)
      .select(col("id"), col("r"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (shards <- Seq(1, 7, 32, 1000)) {
      val got = SortedNeighborhood.rankByOrder(df, Seq("k", "id"), shards)
        .select(col("id"), col("snm_rank"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect, s"shards=$shards")
    }
  }

  test("rank is a permutation of 0..N-1 and re-runs agree") {
    val df = (0 until 200).map(i => (i.toLong, s"${i % 13}")).toDF("id", "k")
    val a = SortedNeighborhood.rankByOrder(df, Seq("k", "id"), 8)
      .select("id", "snm_rank").as[(Long, Long)].collect().sorted
    val b = SortedNeighborhood.rankByOrder(df, Seq("k", "id"), 8)
      .select("id", "snm_rank").as[(Long, Long)].collect().sorted
    assert(a.map(_._2).sorted.toSeq === (0L until 200L))
    assert(a.toSeq === b.toSeq)
  }

  test("window pairing finds the planted near-duplicate, honors maxDist") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"),                  // near-dup of 1, dist 6
      (3L, "zzz completely unrelated text about other things entirely"),
      (4L, "the quick brown fox differs entirely beyond prefix with wholly other words here")
    ).toDF("doc_id", "text")
    val got = SortedNeighborhood.pairs(docs, "doc_id", "text",
        substring(lower(trim(col("text"))), 1, 24), window = 3, maxDist = 10)
      .select("lo_id", "hi_id", "dist")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 2L, 6L)))
  }

  test("empty input yields an empty, well-typed result") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = SortedNeighborhood.pairs(docs, "doc_id", "text",
      substring(lower(trim(col("text"))), 1, 24), window = 2, maxDist = 5)
    assert(out.columns.toSeq === Seq("lo_id", "hi_id", "gap", "dist"))
    assert(out.count() === 0L)
  }
}
