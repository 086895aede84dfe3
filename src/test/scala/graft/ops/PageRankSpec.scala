package graft.ops

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("a sink pointed at by everyone outranks the pointers") {
    // star: 1..5 all point at 0; 0 points at 1 (so it is not dangling)
    val nodes = (0L to 5L).toDF("id")
    val edges = ((1L to 5L).map(i => (i, 0L)) :+ (0L, 1L)).toDF("src", "dst")
    val r = PageRank.run(nodes, edges, iters = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(0L) > r(1L), s"hub must outrank spokes: $r")
    assert((2L to 5L).forall(i => r(1L) > r(i)),
      s"node 1 (pointed at by the hub) outranks plain spokes: $r")
  }

  test("isolated nodes keep the base rank; total mass is conserved sans damping leak") {
    val nodes = (0L to 3L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val r = PageRank.run(nodes, edges, damping = 0.85, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // 2 and 3 are isolated: exactly the (1-d) base every iteration
    assert(r(2L) == 0.15 && r(3L) == 0.15)
    // 0 and 1 feed each other the full damped mass: rank 1.0 exactly
    assert(r(0L) == 1.0 && r(1L) == 1.0)
  }

  test("deterministic across partitionings") {
    val nodes = (0L until 50L).toDF("id").repartition(7)
    val edges = (0L until 200L).map(i => (i % 50, (i * 13 + 7) % 50))
      .toDF("src", "dst").repartition(5)
    def run() = PageRank.run(nodes, edges, iters = 4)
      .collect().map(x => (x.getLong(0), x.getDouble(1))).sortBy(_._1).toSeq
    assert(run() == run())
  }
}
