package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(vs: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] = {
    val out = ConnectedComponents
      .run(vs.toDF("id"), es.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    graft.CacheRegistry.releaseAll()
    out
  }

  test("chain, triangle, and singleton resolve to component minima") {
    // chain 10-9-8-7-6 (worst case for plain propagation: the min sits
    // at one end), triangle 1-2-3, singleton 42
    val vs = Seq(1L, 2L, 3L, 6L, 7L, 8L, 9L, 10L, 42L)
    val es = Seq((10L, 9L), (9L, 8L), (8L, 7L), (7L, 6L),
      (1L, 2L), (2L, 3L), (3L, 1L))
    val got = cc(vs, es)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      6L -> 6L, 7L -> 6L, 8L -> 6L, 9L -> 6L, 10L -> 6L, 42L -> 42L))
  }

  test("long path converges within the log-round budget") {
    // a 200-vertex path needs ~200 plain-propagation rounds; pointer
    // jumping must close it well inside the default 30-round bound
    val n = 200L
    val vs = (1L to n)
    val es = (1L until n).map(i => (i + 1, i))
    val got = cc(vs, es)
    assert(got.size === n)
    assert(got.values.forall(_ == 1L))
  }

  test("duplicate, reversed, and self-loop edges are tolerated") {
    val got = cc(Seq(5L, 6L, 7L),
      Seq((5L, 6L), (6L, 5L), (5L, 6L), (7L, 7L)))
    assert(got === Map(5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("per-round label stats stay clamped (no BigInt sizeInBytes blowup)") {
    // The long-path shape drives the most rounds; without the
    // checkpointWithStats clamp, each round's join SQUARES the label
    // frame's sizeInBytes estimate (bit length doubles per round —
    // the 45-minute q_mutual_knn Toom-Cook wedge). The returned
    // frame's estimate must instead price ~|V| rows.
    val n = 200L
    val out = ConnectedComponents.run(
      (1L to n).toDF("id"),
      (1L until n).map(i => (i + 1, i)).toDF("src", "dst"))
    val size = out.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.stats.sizeInBytes
    graft.CacheRegistry.releaseAll()
    // the returned plan is vertices ⋈ labels, so the estimate is one
    // benign product over the CLAMPED per-round frame — small-integer
    // bits. Unclamped, a 200-path's ~8 pointer-jump rounds double the
    // bit length each round and this reads thousands of bits.
    assert(size.bitLength < 64,
      s"expected small clamped stats, got $size (${size.bitLength} bits)")
  }

  test("duplicateClusters groups exact and near copies transitively") {
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away into the deep dark forest tonight"
    val docs = Seq(
      (1L, base, "a"),
      (2L, base, "a"),                       // exact copy of 1
      (3L, base + " extra", "b"),            // near dup of 1
      (4L, "completely different text about spark catalyst optimizer " +
        "rules and physical planning strategies for large joins", "b"),
      (5L, base.toUpperCase, "c")            // normalizes to 1's fp
    ).toDF("doc_id", "text", "source")
    val got = graft.dedup.Dedup
      .duplicateClusters(docs, "doc_id", "text", minAgreement = 0.5)
      .as[(Long, Long)].collect().toMap
    graft.CacheRegistry.releaseAll()
    assert(got(1L) === 1L && got(2L) === 1L && got(5L) === 1L)
    assert(got(3L) === 1L)   // linked through the shared shingles
    assert(got(4L) === 4L)   // singleton
    assert(got.size === 5)
  }
}
