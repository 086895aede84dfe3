package graft.ops

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def sym(e: Seq[(Long, Long)]) =
    (e ++ e.map(_.swap)).toDF("src", "dst")

  test("triangle with a pendant: 2-core keeps the triangle only") {
    // 0-1-2 triangle; 3 hangs off 0
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (0L, 3L))
    val nodes = (0L to 3L).toDF("id")
    val r = KCore.run(nodes, sym(edges), k = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2)))
    assert(r.map(_._1).sorted.toSeq == Seq(0L, 1L, 2L), r.mkString(","))
    assert(r.forall(_._2 == 2L), s"residual degree 2 inside the core: ${r.mkString(",")}")
    assert(r.forall(_._3), "small graph converges within default rounds")
  }

  test("cascading peel: a chain dissolves entirely under k=2") {
    val edges = (0L until 9L).map(i => (i, i + 1)) // path of 10 vertices
    val nodes = (0L to 9L).toDF("id")
    val r = KCore.run(nodes, sym(edges), k = 2, rounds = 6).collect()
    assert(r.isEmpty, s"a path has no 2-core: ${r.mkString(",")}")
  }

  test("converged=false when rounds stop before the fixpoint") {
    // chain needs ~5 peels from each end under k=2; one round is not enough
    val edges = (0L until 9L).map(i => (i, i + 1))
    val nodes = (0L to 9L).toDF("id")
    val r = KCore.run(nodes, sym(edges), k = 2, rounds = 1).collect()
    assert(r.nonEmpty && r.forall(!_.getBoolean(2)),
      s"partial peel must self-report: ${r.mkString(",")}")
  }

  test("deterministic across partitionings") {
    val edges = (0L until 400L).map(i => (i % 80, (i * 13 + 7) % 80))
      .filter { case (a, b) => a != b }
    val nodes = (0L until 80L).toDF("id").repartition(7)
    def run() = KCore.run(nodes, sym(edges).repartition(5), k = 6)
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1).toSeq
    assert(run() == run())
  }
}
