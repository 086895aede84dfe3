package graft.ops

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Double, Long)]): Set[Long] =
    pts.filterNot { case (_, q, t) =>
      pts.exists { case (_, q2, t2) =>
        q2 >= q && t2 <= t && (q2 > q || t2 < t)
      }
    }.map(_._1).toSet

  private def run(pts: Seq[(Long, Double, Long)]): Set[Long] =
    Skyline.front2d(pts.toDF("id", "q", "t"), "q", "t")
      .collect().map(_.getLong(0)).toSet

  test("hand case: dominated interior points drop, frontier stays") {
    val pts = Seq(
      (1L, 0.9, 100L), // high quality, long — on front
      (2L, 0.9, 80L),  // same quality, shorter — dominates 1
      (3L, 0.5, 50L),  // mid trade-off — on front
      (4L, 0.4, 60L),  // worse than 3 on both — dominated
      (5L, 0.1, 10L))  // cheap — on front
    assert(run(pts) == Set(2L, 3L, 5L))
  }

  test("duplicate points neither dominate the other; both stay") {
    val pts = Seq((1L, 0.5, 50L), (2L, 0.5, 50L), (3L, 0.2, 60L))
    assert(run(pts) == Set(1L, 2L))
  }

  test("matches the quadratic definition on pseudo-random data") {
    val pts = (0L until 200L).map { i =>
      (i, ((i * 37) % 101) / 100.0, (i * 53) % 97)
    }
    assert(run(pts) == brute(pts))
  }

  test("deterministic across partitionings; single max level works") {
    val pts = (0L until 50L).map(i => (i, 0.7, (i * 13) % 31))
    val df = pts.toDF("id", "q", "t").repartition(7)
    val a = Skyline.front2d(df, "q", "t").collect().map(_.getLong(0)).toSet
    assert(a == brute(pts))
    assert(a == run(pts))
  }
}
