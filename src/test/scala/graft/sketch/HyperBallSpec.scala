package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HyperBall laws on small graphs: ball estimates are monotone in r,
  * isomorphic nodes agree exactly, and once r reaches the diameter
  * every node's ball equals the plain HLL estimate of the full node
  * set — the register max-merge IS the union sketch (the q_hll_rollup
  * identity, propagated along edges).
  */
class HyperBallSpec extends SparkSpec {
  import spark.implicits._

  private val b = 6

  private def balls(edgePairs: Seq[(Long, Long)], rounds: Int) = {
    val ed = edgePairs.toDF("src", "dst")
    val edges = ed.unionAll(ed.select(col("dst").as("src"),
      col("src").as("dst")))
    val nodes = edges.select(col("src").as("id")).distinct()
    val out = HyperBall.ballSizes(nodes, edges, rounds, b)
      .select(col("id"), col("r"), col("n_est"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    graft.CacheRegistry.releaseAll()
    out
  }

  test("path graph: estimates are monotone in r and converge to the full set") {
    // 1 — 2 — 3: diameter 2
    val m = balls(Seq((1L, 2L), (2L, 3L)), rounds = 2)
    for (id <- Seq(1L, 2L, 3L); r <- 0 to 1)
      assert(m((id, r)) <= m((id, r + 1)),
        s"ball($id) must be monotone at r=$r")
    // full-ball law: at r = diameter every node sketches {1,2,3}
    val full = Hll.estimate(Seq(1L, 2L, 3L).toDF("id").withColumn("g", lit(1)),
      Seq("g"), "id", b).select(col("n_est")).head().getDouble(0)
    for (id <- Seq(1L, 2L, 3L)) assert(m((id, 2)) === full)
  }

  test("isomorphic endpoints agree; the center sees everything one round early") {
    val m = balls(Seq((1L, 2L), (2L, 3L)), rounds = 1)
    assert(m((1L, 1)) === m((3L, 1))) // endpoints: {self, center}
    assert(m((2L, 1)) > m((1L, 1)))   // center already holds all 3
  }

  test("hop plot aggregates exact-integer totals over per-node roundings") {
    val ed = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val edges = ed.unionAll(ed.select(col("dst").as("src"),
      col("src").as("dst")))
    val nodes = edges.select(col("src").as("id")).distinct()
    val est = HyperBall.ballEstimatesInt(nodes, edges, rounds = 1, b = b)
    val expected = est.groupBy(col("r")).agg(sum(col("est_i")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val hop = HyperBall.hopPlot(est).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    graft.CacheRegistry.releaseAll()
    assert(hop === expected)
  }

  test("exact ball sizes: path graph pairs frontier, per-seed counts") {
    val ed = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val edges = ed.unionAll(ed.select(col("dst").as("src"),
      col("src").as("dst")))
    val seeds = Seq(1L, 2L).toDF("id")
    val m = HyperBall.exactBallSizes(seeds, edges, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    graft.CacheRegistry.releaseAll()
    assert(m((1L, 0)) === 1L && m((2L, 0)) === 1L)
    assert(m((1L, 1)) === 2L && m((2L, 1)) === 3L) // center sees all at r=1
    assert(m((1L, 2)) === 3L && m((2L, 2)) === 3L)
  }

  test("small-range correction: tiny balls read their exact size") {
    // path 1—2—3: raw HLL for a 1-element set reads ~0.7·m (the
    // small-range inflation); the in-engine linear-counting branch
    // must bring every r=0 ball to exactly 1 and the r=1 balls to
    // their true sizes — and node 4 is GENUINELY dst-only (1 → 4
    // directed, nodes built from src only, so {1,2,3} misses it):
    // only the seeded dst-union gives it a row at all (the
    // asymmetric-edge-list fix: its r=0 ball is 1, not absent/NULL).
    // The r15 version of this test used edge (4,1), where 4 IS a src
    // and distinct-src already covered every dst — it passed even
    // without the fix it claimed to pin (ADVICE r15).
    val edges = (Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)) ++
      Seq((1L, 4L))).toDF("src", "dst")
    val nodes = edges.select(col("src").as("id")).distinct()
    assert(nodes.collect().map(_.getLong(0)).toSet === Set(1L, 2L, 3L),
      "precondition: 4 must be absent from the src-derived node set")
    val est = HyperBall.ballEstimatesInt(nodes, edges, rounds = 1, b = b)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    graft.CacheRegistry.releaseAll()
    for (id <- Seq(1L, 2L, 3L, 4L)) assert(est((id, 0)) === 1L)
    assert(est((1L, 1)) === 2L)  // in-neighbors {2} → {1,2}
    assert(est((2L, 1)) === 3L)  // {1,2,3}
    assert(est((3L, 1)) === 2L)  // {2,3}
    assert(est((4L, 1)) === 2L)  // pushed from 1 → {1,4}
  }

  test("harmonic centrality ranks the star center first, ties by id") {
    // star: 9 — {1,2,3}; center 9 reaches everyone at r=1
    val ed = Seq((9L, 1L), (9L, 2L), (9L, 3L)).toDF("src", "dst")
    val edges = ed.unionAll(ed.select(col("dst").as("src"),
      col("src").as("dst")))
    val nodes = edges.select(col("src").as("id")).distinct()
    val est = HyperBall.ballEstimatesInt(nodes, edges, rounds = 2, b = b)
      .persist()
    val top = HyperBall.harmonicCentrality(est, rounds = 2, k = 4).collect()
    graft.CacheRegistry.releaseAll()
    est.unpersist()
    assert(top.head.getLong(0) === 9L)
    // leaves are isomorphic: identical centrality, id-ordered
    val leaves = top.tail.map(r => (r.getLong(0), r.getDouble(4)))
    assert(leaves.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(leaves.map(_._2).distinct.length === 1)
  }
}
