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
}
