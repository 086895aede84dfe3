package graft.ops

import graft.SparkSpec

class SurvivorshipSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // cluster 1: three members, mixed fields
    (1L, 10L, "short", "en", "web", 5L),
    (1L, 11L, "the longest text here", "en", "books", 21L),
    (1L, 12L, "mid text", "fr", "web", 8L),
    // cluster 2: singleton with a NULL categorical
    (2L, 20L, "solo", null.asInstanceOf[String], "web", 4L),
    // cluster 3: length tie broken by smaller id
    (3L, 31L, "aaaa", "de", "web", 4L),
    (3L, 30L, "bbbb", "de", "cc", 4L))
    .toDF("cluster_id", "doc_id", "text", "lang", "source", "n_chars")

  private def golden() = Survivorship.goldenRecords(rows,
    "cluster_id", "doc_id", "text", Seq("lang", "source"), Seq("n_chars"))
    .collect().map(r => r.getLong(0) -> r).toMap

  test("longest text elects the canonical id; sums and counts fuse") {
    val g = golden()
    assert(g(1L).getLong(1) == 3L) // n_members
    assert(g(1L).getLong(2) == 11L) // canonical_id: longest text
    assert(g(1L).getLong(3) == 21L) // canonical_len
    assert(g(1L).getLong(4) == 34L) // sum_n_chars
  }

  test("modal fields: most frequent wins, ties to smallest value, NULLs ignored") {
    val g = golden()
    assert(g(1L).getString(5) == "en", "en(2) beats fr(1)")
    assert(g(1L).getString(6) == "web", "web(2) beats books(1)")
    // cluster 2: lang all NULL -> fused NULL survives the left join
    assert(g(2L).isNullAt(5))
    assert(g(2L).getString(6) == "web")
    // cluster 3: length tie 4==4 -> smaller doc_id 30 wins
    assert(g(3L).getLong(2) == 30L)
    // source tie web(1) vs cc(1) -> smallest value "cc"
    assert(g(3L).getString(6) == "cc")
  }

  test("deterministic across partitionings") {
    val shuffled = rows.repartition(7)
    def run() = Survivorship.goldenRecords(shuffled, "cluster_id", "doc_id",
      "text", Seq("lang", "source"), Seq("n_chars"))
      .collect().map(_.toString).sorted.toSeq
    assert(run() == run())
  }
}
