package graft.ops

import graft.SparkSpec

class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def sym(e: Seq[(Long, Long)]) =
    (e ++ e.map(_.swap)).toDF("src", "dst")

  test("path graph: hop distances from a single seed, radius-bounded") {
    // path 0—1—2—3—4—5; seed {0}; rounds=4 reaches 0..4 only
    val edges = sym((0L to 4L).map(i => (i, i + 1)))
    val r = Bfs.run(Seq(0L).toDF("id"), edges, rounds = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L),
      s"vertex 5 is 5 hops away and must be absent: $r")
  }

  test("multi-source: each vertex takes the nearest seed's distance") {
    // path 0—1—2—3—4; seeds {0, 4}: dist = min(i, 4-i)
    val edges = sym((0L to 3L).map(i => (i, i + 1)))
    val r = Bfs.run(Seq(0L, 4L).toDF("id"), edges, rounds = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 0L), s"$r")
  }

  test("shorter path found later never overwrites: min relaxation") {
    // triangle 0—1, 1—2, 0—2 plus tail 2—3; seed {0}
    val edges = sym(Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L)))
    val r = Bfs.run(Seq(0L).toDF("id"), edges, rounds = 4)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L), s"$r")
  }

  test("seed absent from the graph still appears at dist 0; dedup seeds") {
    val edges = sym(Seq((0L, 1L)))
    val r = Bfs.run(Seq(99L, 99L, 0L).toDF("id"), edges, rounds = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(99L -> 0L, 0L -> 0L, 1L -> 1L), s"$r")
  }

  test("deterministic across partitionings") {
    val edges = (0L until 400L).map(i => (i % 80, (i * 13 + 7) % 80))
      .filter { case (a, b) => a != b }
    val seeds = Seq(0L, 17L, 42L).toDF("id")
    def run(parts: Int) =
      Bfs.run(seeds.repartition(parts), sym(edges).repartition(parts + 2))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(run(3) == run(11))
  }
}
