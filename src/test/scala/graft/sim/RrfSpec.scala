package graft.sim

import graft.SparkSpec

class RrfSpec extends SparkSpec {
  import spark.implicits._

  private def ranking(rows: (String, Long, Int)*) =
    rows.toDF("query_id", "id", "rank")

  test("agreement across lists beats a single strong rank") {
    val a = ranking(("q", 1L, 1), ("q", 2L, 2), ("q", 3L, 3))
    val b = ranking(("q", 9L, 1), ("q", 2L, 2), ("q", 3L, 3))
    val out = Rrf.fuse(Seq(a, b), k0 = 60, k = 4).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getInt(4)))
      .toMap
    // id 2 appears at rank 2 in BOTH lists: 2/(62) beats any single 1/(61)
    assert(out(2L)._3 == 1 && out(2L)._2 == 2L)
    assert(out(3L)._3 == 2, s"double rank-3 beats single rank-1: $out")
    assert(Set(1L, 9L).contains(out.find(_._2._3 == 3).get._1))
  }

  test("exact integer contributions: score is Scale div (k0 + rank) summed") {
    val a = ranking(("q", 7L, 1))
    val out = Rrf.fuse(Seq(a), k0 = 60, k = 1).collect().head
    assert(out.getLong(2) == Rrf.Scale / 61)
  }

  test("ties break to the lower id and k bounds output per query") {
    val a = ranking(("q", 5L, 1), ("q", 3L, 2), ("x", 1L, 1))
    val b = ranking(("q", 3L, 1), ("q", 5L, 2), ("x", 2L, 1))
    val out = Rrf.fuse(Seq(a, b), k0 = 60, k = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("q") == 3L) // 3 and 5 tie on {1,2} ranks → lower id
    assert(out("x") == 1L)
  }
}
