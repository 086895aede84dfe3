package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def count(edges: (Long, Long)*): Map[Long, Long] =
    Triangles.perNode(edges.toSeq.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("single triangle: every vertex participates once") {
    assert(count((1L, 2L), (2L, 3L), (3L, 1L)) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("K4: four triangles, each vertex in three") {
    val out = count((1L, 2L), (1L, 3L), (1L, 4L),
      (2L, 3L), (2L, 4L), (3L, 4L))
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(out.values.sum === 12L) // 4 triangles x 3 vertices
  }

  test("star (hub) closes no triangles; pendant edges drop out") {
    assert(count((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)) === Map.empty)
    // triangle + pendant: pendant vertex absent from the output
    assert(count((1L, 2L), (2L, 3L), (3L, 1L), (3L, 9L)) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("reversed duplicates and self-loops canonicalize away") {
    assert(count((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L)) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("matches the 3-way-join brute force on a pseudo-random graph") {
    // deterministic graph: hash-derived edges over 30 nodes
    val edges = (0 until 300).map { i =>
      val u = (i * 7919 + 13) % 30; val v = (i * 104729 + 7) % 30
      (u.toLong, v.toLong)
    }.filter { case (u, v) => u != v }
    val df = edges.toDF("src", "dst")
    val canon = df.filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("u"), greatest($"src", $"dst").as("v"))
      .distinct()
    val e1 = canon.select($"u".as("x"), $"v".as("y"))
    val brute = e1.join(canon.select($"u".as("y"), $"v".as("z")), "y")
      .join(canon.select($"u".as("x"), $"v".as("z")), Seq("x", "z"))
      .select(explode(array($"x", $"y", $"z")).as("id"))
      .groupBy($"id").agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(count(edges: _*) === brute)
  }

  private def coef(edges: (Long, Long)*): Map[Long, (Long, Long, Double)] =
    Triangles.clusteringCoefficient(edges.toSeq.toDF("src", "dst"))
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, d, t, c) => id -> (d, t, c) }.toMap

  test("clustering coefficient: triangle = 1.0 everywhere") {
    assert(coef((1L, 2L), (2L, 3L), (3L, 1L)) ===
      Map(1L -> ((2L, 1L, 1.0)), 2L -> ((2L, 1L, 1.0)),
        3L -> ((2L, 1L, 1.0))))
  }

  test("clustering coefficient: star hub is 0; pendants excluded") {
    // hub deg 4, no closed wedges; leaves have deg 1 (undefined, absent)
    assert(coef((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)) ===
      Map(1L -> ((4L, 0L, 0.0))))
  }

  test("clustering coefficient: triangle + pendant dilutes one vertex") {
    // vertex 3 has deg 3 (2 triangle edges + pendant), 1 triangle:
    // 2*1/(3*2) = 0.333333; pendant vertex 9 deg 1 → absent
    val out = coef((1L, 2L), (2L, 3L), (3L, 1L), (3L, 9L))
    assert(out(3L) === ((3L, 1L, 0.333333)))
    assert(out(1L) === ((2L, 1L, 1.0)))
    assert(!out.contains(9L))
  }

  test("clustering coefficient: K4 is 1.0; deg-2 bridge closes nothing") {
    // K4 plus a path 4-5-6: vertex 5 deg 2 with no triangle → 0.0
    val out = coef((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L))
    assert(out(1L) === ((3L, 3L, 1.0)))
    // vertex 4: deg 4 (K4 + bridge), 3 triangles: 6/(4*3) = 0.5
    assert(out(4L) === ((4L, 3L, 0.5)))
    assert(out(5L) === ((2L, 0L, 0.0)))
    assert(!out.contains(6L))
  }
}
