package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Margin-mining laws: planted translations are recovered exactly,
  * the margin deflates below raw cosine ranking only via the neighbor
  * averages (rank-1 margin ≥ 1 by construction), and the operator is
  * partitioning-invariant.
  */
class BitextMineSpec extends SparkSpec {
  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("planted exact translations are mined 1:1 and accepted") {
    // X = 20 source vectors; Y = their exact copies (id+10000) plus
    // 30 decoys (other corpus vectors, id+20000)
    val xs = emb.filter(col("vec_id") < 20)
    val copies = xs.select((col("vec_id") + 10000).as("vec_id"),
      col("embedding"), col("label"))
    val decoys = emb.filter(col("vec_id") >= 100 && col("vec_id") < 130)
      .select((col("vec_id") + 20000).as("vec_id"), col("embedding"),
        col("label"))
    val mined = BitextMine.mine(xs, copies.union(decoys),
      "vec_id", "embedding", k = 4)
    val rows = mined.collect().map(r =>
      (r.getAs[Long]("src"), r.getAs[Long]("tgt"),
        r.getAs[Boolean]("accepted"))).toSeq
    assert(rows.length === 20)
    rows.foreach { case (src, tgt, accepted) =>
      assert(tgt === src + 10000, s"x=$src should pair with its copy")
      assert(accepted, s"exact copy of $src should clear the margin cut")
    }
  }

  test("hub deflation: margin overrules raw cosine on a planted hub") {
    import spark.implicits._
    // X: x1 along e1, x2..x5 along e2 (they make the hub's own
    // neighborhood strong). Y: hub h (closest to x1 by RAW cosine but
    // near every x2..x5 too), dedicated partner p1 (slightly lower
    // raw cosine to x1, far from everything else), two fillers.
    val xs = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0.2f, 0f)),
      (3L, Array(0f, 0.9f, 0.3f, 0f)),
      (4L, Array(0f, 1f, 0f, 0.1f)),
      (5L, Array(0f, 0.95f, 0.1f, 0.1f))).toDF("vec_id", "embedding")
    val ys = Seq(
      (101L, Array(0.66f, 0.75f, 0f, 0f)), // hub
      (102L, Array(0.6f, 0f, 0.8f, 0f)),   // partner for x1
      (103L, Array(0f, 0f, 0f, 1f)),
      (104L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    // raw cosine prefers the hub for x1…
    val raw1 = Ann.bruteForceTopK(ys, xs.filter(col("vec_id") === 1),
      "vec_id", "embedding", 1).select("neighbor_id")
      .collect().head.getLong(0)
    assert(raw1 === 101L, "precondition: hub must win on raw cosine")
    // …but the margin deflates the hub (its own neighborhood average
    // is high) and mines the dedicated partner instead
    val mined = BitextMine.mine(xs, ys, "vec_id", "embedding", k = 4)
      .filter(col("src") === 1).collect().head
    assert(mined.getAs[Long]("tgt") === 102L)
    assert(mined.getAs[Boolean]("accepted"))
  }

  test("partitioning invariance") {
    def run(p: Int) = BitextMine.mine(
      emb.filter(col("vec_id") % 4 === 0).repartition(p),
      emb.filter(col("vec_id") % 4 === 1).repartition(p),
      "vec_id", "embedding", k = 4)
      .orderBy("src").collect().map(_.toSeq).toSeq
    assert(run(2) === run(5))
  }
}
