package graft.sketch

import graft.SparkSpec

class JoinCardSpec extends SparkSpec {
  import spark.implicits._

  private def exactJoinSize(a: Seq[Long], b: Seq[Long]): Long = {
    val fb = b.groupBy(identity).view.mapValues(_.size.toLong).toMap
    a.map(k => fb.getOrElse(k, 0L)).sum
  }

  private def estOf(a: Seq[Long], b: Seq[Long], w: Int): (Long, Long) = {
    val df = CountMin.joinSizeEstimate(
      a.toDF("ka"), "ka", b.toDF("kb"), "kb", w)
    val rows = df.collect()
    assert(rows.length == CountMin.depth)
    val est = rows.head.getLong(2)
    assert(rows.forall(_.getLong(2) == est))
    // est is the min over the per-depth rows
    assert(est == rows.map(_.getLong(1)).min)
    (est, exactJoinSize(a, b))
  }

  test("one-sided guarantee: estimate never undercounts, at any width") {
    val a = (0L until 500L).map(i => i % 40)         // frequencies 13/12
    val b = (0L until 200L).map(i => (i * 7) % 60)   // overlapping keys
    for (w <- Seq(8, 64, 1024)) {
      val (est, exact) = estOf(a, b, w)
      assert(est >= exact, s"w=$w est=$est < exact=$exact")
    }
  }

  test("wide sketch on few keys is exact (no colliding buckets)") {
    val a = Seq(1L, 1L, 1L, 2L, 2L, 3L)
    val b = Seq(1L, 2L, 2L, 4L)
    val (est, exact) = estOf(a, b, 4096)
    assert(exact == 3L + 2L * 2L)
    assert(est == exact, s"est=$est exact=$exact")
  }

  test("disjoint key sets can still over-estimate but never go negative") {
    val (est, exact) = estOf(Seq(1L, 2L, 3L), Seq(100L, 200L), 8)
    assert(exact == 0L && est >= 0L)
  }

  test("deterministic across partitionings") {
    val a = (0L until 300L).map(i => i % 25)
    val b = (0L until 300L).map(i => i % 17)
    def run() = CountMin.joinSizeEstimate(
      a.toDF("k").repartition(7), "k", b.toDF("k").repartition(5), "k", 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(run() == run())
  }
}
