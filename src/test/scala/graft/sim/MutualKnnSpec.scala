package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Reciprocal-kNN laws: mutual edges are a symmetric subset of the
  * graph, planted tight clusters come out as exactly those
  * components, and hub edges (one-directional) are filtered.
  */
class MutualKnnSpec extends SparkSpec {
  import spark.implicits._

  // three tight clusters of 4 around orthogonal directions, plus one
  // hub vector between clusters A and B: the hub lists cluster
  // members among ITS neighbors, but cluster members prefer each
  // other — reciprocity kills the hub's edges
  private def v(main: Int, eps: Float, j: Int): Array[Float] = {
    val a = Array.fill(8)(0f)
    a(main) = 1f
    a((main + 3) % 8) = eps * (j + 1)
    a
  }
  private lazy val nodes = (
    (0 until 4).map(j => (10L + j, v(0, 0.01f, j))) ++
    (0 until 4).map(j => (20L + j, v(1, 0.01f, j))) ++
    (0 until 4).map(j => (30L + j, v(2, 0.01f, j))) :+
    (99L, Array(0.7f, 0.7f, 0f, 0f, 0f, 0f, 0f, 0f)))
    .toDF("vec_id", "embedding")

  private def graph = KnnGraph.build(nodes, "vec_id", "embedding",
    k = 3, rounds = 2, numPlanes = 2, dim = 8)

  private def mutual = {
    val g = graph.select(col("src"), col("dst"))
    g.as("a").join(g.as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src"))
      .filter(col("a.src") < col("a.dst"))
      .select(col("a.src").as("src"), col("a.dst").as("dst"))
  }

  test("mutual edges stay within planted clusters; hub edges die") {
    val pairs = mutual.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(a / 10 === b / 10, s"cross-cluster mutual edge $a-$b")
      assert((a !== 99L) && (b !== 99L), "hub must not survive reciprocity")
    }
  }

  test("components reconstruct the planted clusters") {
    val comps = graft.ops.ConnectedComponents.run(
        nodes.select(col("vec_id").as("id")), mutual)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (base <- Seq(10L, 20L, 30L)) {
      val ids = (0 until 4).map(base + _)
      assert(ids.map(comps).distinct.length === 1,
        s"cluster at $base should be one component")
      assert(ids.map(comps).head === base)
    }
    assert(comps(99L) === 99L, "hub stays a singleton")
  }
}
