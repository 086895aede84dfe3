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

  /** Clustered fixture for the residual tests: `cPerCluster` points
    * around each of four well-separated centers in R^8, offsets
    * deterministic and small relative to the center spread. This is
    * the regime residual PQ exists for — raw-vector codebooks must
    * span the corpus-wide spread, residual codebooks only the
    * within-cell offsets.
    */
  private def clustered(cPerCluster: Int) = {
    val centers = Seq(
      (0 until 8).map(j => if (j < 4) 10.0 else 0.0),
      (0 until 8).map(j => if (j >= 4) 10.0 else 0.0),
      (0 until 8).map(j => if (j % 2 == 0) -10.0 else 0.0),
      (0 until 8).map(j => if (j % 2 == 1) -10.0 else 0.0))
    val rows = for {
      c <- centers.indices
      i <- 0 until cPerCluster
    } yield {
      val id = (c * cPerCluster + i + 1).toLong
      (id, (0 until 8).map(j =>
        centers(c)(j) + 0.7 * math.sin(id * 13 + j * 7)).toArray)
    }
    (rows.toDF("vec_id", "embedding"), rows)
  }

  test("residuals subtract the assigned cell centroid exactly") {
    val (v, rows) = clustered(10)
    val coarse = KMeans.fit(v, "vec_id", "embedding", k = 4, iters = 3)
    val cellOf = KMeans.assignWith(v, "vec_id", "embedding", coarse)
      .select($"vec_id", $"cluster").as[(Long, Int)].collect().toMap
    val cents = coarse.centroids.toMap
    val res = ProductQuantizer.residuals(v, "vec_id", "embedding", coarse)
      .select($"vec_id", $"embedding", $"__cell")
      .as[(Long, Seq[Double], Int)].collect()
    assert(res.length == rows.length)
    val byId = rows.map(r => r._1 -> r._2).toMap
    res.foreach { case (id, rx, cell) =>
      assert(cell == cellOf(id))
      val expected = byId(id).toSeq.zip(cents(cell)).map { case (a, b) => a - b }
      // float x promotes to double exactly; centroid arithmetic is the
      // engines' shared quantized path — equality must be bit-exact
      assert(rx == expected, s"residual mismatch for vec $id")
    }
  }

  test("residual IVF-ADC recall beats or matches the raw-vector variant " +
      "on a planted-cluster fixture") {
    val (v, rows) = clustered(15)
    val coarse = KMeans.fit(v, "vec_id", "embedding", k = 4, iters = 3)
    val raw = ProductQuantizer.fit(v, "vec_id", "embedding",
      dims = 8, m = 4, k = 4, iters = 2)
    val resModel = ProductQuantizer.fitResidual(v, "vec_id", "embedding",
      coarse, dims = 8, m = 4, k = 4, iters = 2)
    // three probe queries, each a perturbed corpus point (the planted
    // neighborhood is its cluster); recall@10 vs exact L2 ground truth
    val byId = rows.map(r => r._1 -> r._2.toSeq).toMap
    val recalls = Seq(3L, 22L, 41L).map { pid =>
      val q = byId(pid).zipWithIndex.map { case (x, j) =>
        x + 0.05 * math.cos(pid * 3 + j)
      }
      val truth = rows.map { case (id, x) =>
        val d = x.toSeq.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
        (d, id)
      }.sorted.take(10).map(_._2).toSet
      def recallOf(hits: Seq[Long]) = hits.count(truth).toDouble / truth.size
      val rawHits = ProductQuantizer.ivfAdcTopK(v, "vec_id", "embedding",
        coarse, raw, q, nprobe = 2, n = 10)
        .as[(Long, String, Double)].collect().map(_._1).toSeq
      val resHits = ProductQuantizer.ivfAdcResidualTopK(v, "vec_id",
        "embedding", coarse, resModel, q, nprobe = 2, n = 10)
        .as[(Long, String, Double)].collect().map(_._1).toSeq
      (recallOf(rawHits), recallOf(resHits))
    }
    val rawAvg = recalls.map(_._1).sum / recalls.size
    val resAvg = recalls.map(_._2).sum / recalls.size
    info(f"recall@10 raw=$rawAvg%.3f residual=$resAvg%.3f")
    assert(resAvg >= rawAvg,
      f"residual recall $resAvg%.3f below raw $rawAvg%.3f")
    assert(resAvg >= 0.7, f"residual recall $resAvg%.3f below floor")
  }

  test("residual search is deterministic and emits the adcTopK shape") {
    val (v, _) = clustered(8)
    val coarse = KMeans.fit(v, "vec_id", "embedding", k = 4, iters = 2)
    val model = ProductQuantizer.fitResidual(v, "vec_id", "embedding",
      coarse, dims = 8, m = 2, k = 3, iters = 2)
    val q = (0 until 8).map(j => 10.0 * math.sin(j))
    def run() = ProductQuantizer.ivfAdcResidualTopK(v, "vec_id", "embedding",
      coarse, model, q, nprobe = 2, n = 5)
      .as[(Long, String, Double)].collect().toSeq
    val out = run()
    assert(out == run())
    assert(out.nonEmpty && out.forall { case (_, code, adist) =>
      code.split("-").length == 2 && adist >= 0.0
    })
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
