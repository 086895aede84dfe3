package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeqPackSpec extends SparkSpec {
  import spark.implicits._

  test("prefix sum equals the sequential cumsum under the total order") {
    val df = (1L to 100L).map(i => (i, i % 7)).toDF("id", "v")
    val out = SeqPack.prefixSumByOrder(df, "v", Seq("id"), numShards = 8)
      .select($"id", $"prefix").as[(Long, Long)].collect().toMap
    var acc = 0L
    (1L to 100L).foreach { i =>
      assert(out(i) === acc, s"row $i")
      acc += i % 7
    }
    graft.CacheRegistry.releaseAll()
  }

  test("prefix sum is partitioning-invariant") {
    val df = (1L to 200L).map(i => (i, (i * 31) % 13)).toDF("id", "v")
    val a = SeqPack.prefixSumByOrder(df.repartition(1), "v", Seq("id"), 4)
      .select($"id", $"prefix").as[(Long, Long)].collect().sorted
    val b = SeqPack.prefixSumByOrder(df.repartition(16), "v", Seq("id"), 7)
      .select($"id", $"prefix").as[(Long, Long)].collect().sorted
    assert(a.sameElements(b))
    graft.CacheRegistry.releaseAll()
  }

  test("a NULL value fails loudly instead of silently shifting offsets") {
    val df = Seq((1L, java.lang.Long.valueOf(3L)),
      (2L, null.asInstanceOf[java.lang.Long]), (3L, java.lang.Long.valueOf(5L)))
      .toDF("id", "v")
    val ex = intercept[Exception] {
      SeqPack.prefixSumByOrder(df, "v", Seq("id"), 2).collect()
    }
    assert(ex.getMessage != null)
    graft.CacheRegistry.releaseAll()
  }

  test("pack arithmetic: stream conservation, empty docs, crossing flag") {
    // lengths chosen to straddle one L=10 boundary and include an
    // empty doc; order key = id so the stream is 1,2,3,4,5
    val df = Seq((1L, 4L), (2L, 0L), (3L, 8L), (4L, 10L), (5L, 3L))
      .toDF("doc_id", "n")
    val out = SeqPack.pack(df, "doc_id", col("n"), col("doc_id"),
        seqLen = 10, numShards = 4)
      .select($"doc_id", $"prefix", $"seq_first", $"seq_last", $"n_seqs",
        $"crosses")
      .as[(Long, Long, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap
    // doc1: [0,4) → seq 0 only
    assert(out(1L) === ((1L, 0L, 0L, 0L, 1L, 0)))
    // doc2: empty at offset 4 → occupies nothing
    assert(out(2L) === ((2L, 4L, 0L, 0L, 0L, 0)))
    // doc3: [4,12) → seqs 0..1, crosses
    assert(out(3L) === ((3L, 4L, 0L, 1L, 2L, 1)))
    // doc4: [12,22) → seqs 1..2, crosses
    assert(out(4L) === ((4L, 12L, 1L, 2L, 2L, 1)))
    // doc5: [22,25) → seq 2 only
    assert(out(5L) === ((5L, 22L, 2L, 2L, 1L, 0)))
    graft.CacheRegistry.releaseAll()
  }
}
