package graft.ops

import graft.SparkSpec
import graft.sim.KMeans
import org.apache.spark.sql.Row

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  test("planted blobs separate into their own clusters") {
    // two tight 4-dim blobs far apart; any sane k=2 run must split them
    val rows = (0 until 20).map(i => (i.toLong, Seq(10.0f, 10f, 10f, 10f)
      .map(_ + (i % 5) * 0.01f))) ++
      (20 until 40).map(i => (i.toLong, Seq(-10.0f, -10f, -10f, -10f)
        .map(_ + (i % 5) * 0.01f)))
    val df = rows.toDF("vec_id", "embedding")
    val out = KMeans.fitAssign(df, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val blobA = (0 until 20).map(i => out(i.toLong)).toSet
    val blobB = (20 until 40).map(i => out(i.toLong)).toSet
    assert(blobA.size == 1 && blobB.size == 1 && blobA != blobB)
  }

  test("fitAssign is deterministic across runs") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def run() = KMeans.fitAssign(emb, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map { case Row(id: Long, cl: Int, d: Double) => (id, cl, d) }
      .sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("empty clusters keep their previous centroid") {
    // all points identical: both seeds coincide, ties send every row to
    // cluster 0, cluster 1 empties — its centroid must survive training
    val df = (0L until 4L).map(i => (i, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val m = KMeans.fit(df, "vec_id", "embedding", k = 2, iters = 3)
    assert(m.centroids.size == 2)
    assert(m.centroids.map(_._2).distinct.size == 1) // both at the same point
    val asg = KMeans.fitAssign(df, "vec_id", "embedding", k = 2, iters = 3)
      .collect()
    assert(asg.forall(r => r.getInt(1) == 0 && r.getDouble(2) == 0.0))
  }

  test("index append: delta assignment ≡ full assignment under the same model") {
    // train on the even half only (the "existing index"), then append
    // the odd half: each appended vector must land exactly where a
    // full-corpus assignment with the SAME model would put it, and the
    // existing half's assignments are untouched by the append
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val existing = emb.filter($"vec_id" % 2 === 0)
    val delta = emb.filter($"vec_id" % 2 === 1)
    val m = KMeans.fit(existing, "vec_id", "embedding", k = 4, iters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map { case Row(id: Long, cl: Int, d: Double) => (id, cl, d) }.toSet
    val appended = rows(KMeans.assignDist(delta, "vec_id", "embedding", m))
    val full = rows(KMeans.assignDist(emb, "vec_id", "embedding", m))
    assert(appended == full.filter(_._1 % 2 == 1))
    assert(appended.nonEmpty && appended.map(_._1).forall(_ % 2 == 1))
    // fitAssign delegates: same-frame fit+assign matches the two-step
    val oneShot = rows(KMeans.fitAssign(existing, "vec_id", "embedding", 4, 2))
    assert(oneShot == rows(KMeans.assignDist(existing, "vec_id", "embedding", m)))
  }

  test("centroid update is the exact quantized mean") {
    // one cluster, comps chosen so the mean is exactly representable:
    // mean of 1.0 and 2.0 is 1.5
    val df = Seq((0L, Seq(1.0f, 4.0f)), (1L, Seq(2.0f, 8.0f)))
      .toDF("vec_id", "embedding")
    val m = KMeans.fit(df, "vec_id", "embedding", k = 1, iters = 1)
    assert(m.centroids.head._2 == Seq(1.5, 6.0))
  }
}
