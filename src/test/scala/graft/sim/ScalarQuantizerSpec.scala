package graft.sim

import graft.SparkSpec

class ScalarQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, d: Int) =
    (1L to n.toLong).map(i =>
      (i, (0 until d).map(j => math.sin(i * 31 + j)).toArray))
      .toDF("vec_id", "embedding")

  test("reconstruction error is bounded by the quantization step") {
    val out = ScalarQuantizer.encode(vecs(40, 8), "vec_id", "embedding")
      .as[(Long, Double, String, Double)].collect()
    assert(out.length == 40)
    out.foreach { case (_, scale, code, err) =>
      val q = code.split(",").map(_.toInt)
      assert(q.length == 8)
      assert(q.forall(c => c >= -127 && c <= 127))
      // per-component error ≤ scale/2 → squared-L2 ≤ d·(scale/2)²
      assert(err >= 0.0 && err <= 8 * (scale / 2) * (scale / 2) + 1e-9)
    }
  }

  test("all-zero vectors quantize to zeros with scale 1 and zero error") {
    val v = Seq((1L, Array.fill(4)(0.0))).toDF("vec_id", "embedding")
    val Array((_, scale, code, err)) =
      ScalarQuantizer.encode(v, "vec_id", "embedding")
        .as[(Long, Double, String, Double)].collect()
    assert(scale == 1.0 && code == "0,0,0,0" && err == 0.0)
  }

  test("encoding is deterministic across runs") {
    def run() = ScalarQuantizer.encode(vecs(25, 8), "vec_id", "embedding")
      .as[(Long, Double, String, Double)].collect().sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("topK ranks the query's own row first and orders by distance") {
    val v = vecs(30, 8)
    val q = (0 until 8).map(j => math.sin(7 * 31 + j))
    val out = ScalarQuantizer.topK(v, "vec_id", "embedding", q, 5)
      .as[(Long, Double)].collect()
    assert(out.length == 5)
    // row 7 IS the query; its dequantized self sits within quantization
    // error of q, far below any other corpus row's distance
    assert(out.head._1 == 7L)
    assert(out.map(_._2).toSeq == out.map(_._2).sorted.toSeq)
    assert(out.forall(_._2 >= 0.0))
  }

  test("sq8 distances approximate exact distances within quantization error") {
    val v = vecs(20, 8)
    val rows = (1L to 20L).map(i =>
      i -> (0 until 8).map(j => math.sin(i * 31 + j)))
    val q = (0 until 8).map(j => math.cos(j))
    val exact = rows.map { case (id, x) =>
      id -> x.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
    }.toMap
    val approx = ScalarQuantizer.topK(v, "vec_id", "embedding", q, 20)
      .as[(Long, Double)].collect().toMap
    // scale ≤ 1/127 here, so per-component reconstruction error ≤ 1/254;
    // distance perturbation stays well under 0.1
    approx.foreach { case (id, d) =>
      assert(math.abs(d - exact(id)) < 0.1, s"vec $id: $d vs ${exact(id)}")
    }
  }
}
