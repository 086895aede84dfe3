package graft.ops

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def sym(e: Seq[(Long, Long)]) =
    (e ++ e.map(_.swap)).toDF("src", "dst")

  test("two cliques joined by one bridge split into two communities") {
    // cliques {0,1,2,3} and {10,11,12,13}, bridge 3—10
    val cliqueA = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- 10L to 13L if a < b) yield (a, b)
    val nodes = ((0L to 3L) ++ (10L to 13L)).toDF("id")
    val r = LabelPropagation.run(nodes, sym(cliqueA ++ cliqueB :+ (3L, 10L)))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert((0L to 3L).map(r).toSet.size == 1, s"clique A one community: $r")
    assert((10L to 13L).map(r).toSet.size == 1, s"clique B one community: $r")
    assert(r(0L) != r(10L), s"bridge must not merge the cliques: $r")
  }

  test("isolated vertex keeps its own label") {
    val nodes = Seq(0L, 1L, 99L).toDF("id")
    val r = LabelPropagation.run(nodes, sym(Seq((0L, 1L))))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(99L) == 99L)
    assert(r(0L) == 0L && r(1L) == 0L, s"pair converges to min label: $r")
  }

  test("tie-break is toward the smallest label (deterministic)") {
    // path 0—1—2: round 1, vertex 1 sees votes {1:1, 0:1, 2:1} → 0
    val nodes = (0L to 2L).toDF("id")
    val r = LabelPropagation.run(nodes, sym(Seq((0L, 1L), (1L, 2L))), rounds = 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(1L) == 0L, s"tie must break to min label: $r")
  }

  test("deterministic across partitionings; withSizes counts members") {
    val edges = (0L until 300L).map(i => (i % 60, (i * 17 + 3) % 60))
      .filter { case (a, b) => a != b }
    val nodes = (0L until 60L).toDF("id").repartition(7)
    def run() = LabelPropagation.withSizes(nodes, sym(edges).repartition(5))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1).toSeq
    val a = run()
    assert(a == run())
    val bySize = a.groupBy(_._2)
    assert(a.forall { case (_, c, s) => bySize(c).size.toLong == s })
  }
}
