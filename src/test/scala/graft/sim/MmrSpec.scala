package graft.sim

import graft.SparkSpec

class MmrSpec extends SparkSpec {
  import spark.implicits._

  // three tight neighborhoods around orthogonal-ish anchors, so
  // relevance ranks one neighborhood first and diversity must reach
  // into the others
  private def fixture() = {
    val anchors = Seq(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0),
      Seq(0.0, 0.0, 1.0, 0.0))
    val rows = for {
      a <- anchors.indices
      i <- 0 until 4
    } yield {
      val id = (a * 4 + i + 1).toLong
      (id, anchors(a).zipWithIndex
        .map { case (v, j) => v + 0.02 * math.sin(id * 7 + j) }.toArray)
    }
    rows.toDF("vec_id", "embedding")
  }

  private val q = Seq(1.0, 0.05, 0.05, 0.0)

  test("lambda = 1 reduces to plain relevance top-k") {
    val v = fixture()
    val mmr = Mmr.selectDiverse(v, "vec_id", "embedding", q,
      k = 5, poolSize = 12, lambda = 1.0)
      .as[(Long, Long, Double)].collect().sortBy(_._1).map(_._2).toSeq
    val topk = Ann.bruteForceTopK(v,
      Seq((999L, q.toArray)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 5)
      .orderBy($"rank").as[(Long, Long, Double, Int)]
      .collect().map(_._2).toSeq
    assert(mmr == topk)
  }

  test("diversity reaches into other neighborhoods before exhausting the first") {
    val v = fixture()
    val picks = Mmr.selectDiverse(v, "vec_id", "embedding", q,
      k = 3, poolSize = 12, lambda = 0.5)
      .as[(Long, Long, Double)].collect().sortBy(_._1).map(_._2)
    val clusters = picks.map(id => ((id - 1) / 4).toInt).toSet
    // relevance-only top-3 would stay inside cluster 0; MMR must visit
    // all three neighborhoods
    assert(clusters == Set(0, 1, 2), s"picks $picks")
  }

  test("first pick is always the most relevant candidate") {
    val v = fixture()
    for (lam <- Seq(0.2, 0.5, 0.9)) {
      val first = Mmr.selectDiverse(v, "vec_id", "embedding", q,
        k = 4, poolSize = 12, lambda = lam)
        .filter($"sel_rank" === 1).as[(Long, Long, Double)].collect().head._2
      val top1 = Mmr.selectDiverse(v, "vec_id", "embedding", q,
        k = 1, poolSize = 12, lambda = 1.0)
        .as[(Long, Long, Double)].collect().head._2
      assert(first == top1)
    }
  }

  test("selection is deterministic and ranks are dense from 1") {
    val v = fixture()
    def run() = Mmr.selectDiverse(v, "vec_id", "embedding", q,
      k = 6, poolSize = 12, lambda = 0.7)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val out = run()
    assert(out == run())
    assert(out.map(_._1) == (1L to 6L))
    assert(out.map(_._2).distinct.size == 6)
  }

  test("k beyond the pool returns exactly the pool") {
    val v = fixture().limit(3)
    val out = Mmr.selectDiverse(v, "vec_id", "embedding", q,
      k = 10, poolSize = 10, lambda = 0.7)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 3)
  }
}
