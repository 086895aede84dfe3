package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, d: Int) =
    (1L to n.toLong).map(i =>
      (i, (0 until d).map(j => math.sin(i * 31 + j).abs).toArray))
      .toDF("vec_id", "embedding")

  test("codes have m parts in [0, k) and err is non-negative") {
    val out = ProductQuantizer
      .fitEncode(vecs(40, 8), "vec_id", "embedding",
        dims = 8, m = 4, k = 3, iters = 2)
      .as[(Long, String, Double)].collect()
    assert(out.length == 40)
    out.foreach { case (_, code, err) =>
      val parts = code.split("-")
      assert(parts.length == 4)
      assert(parts.forall(p => p.toInt >= 0 && p.toInt < 3))
      assert(err >= 0.0)
    }
  }

  test("encoding is deterministic across runs") {
    def run() = ProductQuantizer
      .fitEncode(vecs(30, 8), "vec_id", "embedding",
        dims = 8, m = 2, k = 4, iters = 2)
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("m = 1 degenerates to plain k-means: same cluster, same error") {
    val v = vecs(25, 8)
    val pq = ProductQuantizer
      .fitEncode(v, "vec_id", "embedding", dims = 8, m = 1, k = 4, iters = 2)
      .select($"vec_id", $"code", $"err")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    val km = KMeans.fitAssign(v, "vec_id", "embedding", k = 4, iters = 2)
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    assert(pq.map(t => (t._1, t._2)) == km.map(t => (t._1, t._2.toString)))
    assert(pq.map(_._3) == km.map(_._3))
  }

  test("with every vector a centroid (k = n, iters = 0), err is ~0") {
    val v = vecs(6, 4)
    val out = ProductQuantizer
      .fitEncode(v, "vec_id", "embedding", dims = 4, m = 2, k = 6, iters = 0)
      .as[(Long, String, Double)].collect()
    assert(out.forall(_._3 <= 1e-9))
  }

  test("ivfAdcTopK with every cell probed recovers plain ADC top-k") {
    val v = vecs(40, 8)
    val coarse = KMeans.fit(v, "vec_id", "embedding", k = 4, iters = 2)
    val model = ProductQuantizer.fit(v, "vec_id", "embedding",
      dims = 8, m = 2, k = 3, iters = 2)
    val q = (0 until 8).map(j => math.sin(5 * 31 + j).abs)
    val full = ProductQuantizer.adcTopK(v, "vec_id", "embedding", model, q, 10)
      .as[(Long, String, Double)].collect().toSeq
    val ivf = ProductQuantizer.ivfAdcTopK(v, "vec_id", "embedding",
      coarse, model, q, nprobe = 4, n = 10)
      .as[(Long, String, Double)].collect().toSeq
    assert(ivf == full) // all cells probed → the filter keeps everything
  }

  test("ivfAdcTopK results come only from probed cells") {
    val v = vecs(40, 8)
    val coarse = KMeans.fit(v, "vec_id", "embedding", k = 4, iters = 2)
    val model = ProductQuantizer.fit(v, "vec_id", "embedding",
      dims = 8, m = 2, k = 3, iters = 2)
    val q = (0 until 8).map(j => math.sin(5 * 31 + j).abs)
    val hits = ProductQuantizer.ivfAdcTopK(v, "vec_id", "embedding",
      coarse, model, q, nprobe = 1, n = 40)
      .as[(Long, String, Double)].collect().map(_._1).toSet
    val cellOf = KMeans.assignWith(v, "vec_id", "embedding", coarse)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    assert(hits.nonEmpty && hits.map(cellOf).size == 1)
  }

  test("adcTopK ranks the query's own row first under exact quantization") {
    val v = vecs(6, 4)
    val model = ProductQuantizer.fit(v, "vec_id", "embedding",
      dims = 4, m = 2, k = 6, iters = 0)
    val q = (0 until 4).map(j => math.sin(3 * 31 + j).abs)
    val out = ProductQuantizer.adcTopK(v, "vec_id", "embedding", model, q, 3)
      .as[(Long, String, Double)].collect()
    assert(out.length == 3)
    // every vector is its own centroid, so the query's row quantizes
    // to itself with table distance 0 — the unambiguous top-1
    assert(out.head._1 == 3L && out.head._3 == 0.0)
    assert(out.forall(_._3 >= 0.0))
  }
}
