package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

class OpqSpec extends SparkSpec {
  import spark.implicits._

  // 8-dim corpus = independent latents of very different scales mixed
  // by a fixed rotation — the correlated fixture where a learned
  // rotation genuinely matters (same construction as PcaSpec's
  // OPQ-lite measurement)
  private lazy val rows = {
    val rnd = new scala.util.Random(11)
    val scales = Array(12.0, 9.0, 6.0, 4.0, 2.0, 1.0, 0.5, 0.25)
    val mix = Pca.jacobi(Array.tabulate(8, 8)((i, j) =>
      math.sin(i * 3 + j * 7).abs + (if (i == j) 2.0 else 0.0)))._2
    (1 to 3000).map { i =>
      val z = scales.map(_ * rnd.nextGaussian())
      val x = Array.tabulate(8)(r =>
        (0 until 8).map(c => mix(r)(c) * z(c)).sum)
      (i.toLong, x)
    }
  }
  private lazy val raw = rows.toDF("vec_id", "v")

  test("procrustes recovers a known orthonormal alignment exactly") {
    val d = 6
    val rnd = new scala.util.Random(3)
    // a genuinely orthonormal Q: eigenvectors of a random symmetric
    val q = Pca.jacobi(Array.tabulate(d, d) { (i, j) =>
      val lo = math.min(i, j); val hi = math.max(i, j)
      math.sin(lo * 5 + hi * 13)
    })._2 // columns orthonormal; use as Q_ij = q(i)(j)
    val xs = Array.fill(200)(Array.fill(d)(rnd.nextGaussian()))
    // ŷ = Q x (y_i = Σ_j Q_ij x_j), M = Σ x ŷᵀ
    val m = Array.ofDim[Double](d, d)
    xs.foreach { x =>
      val y = Array.tabulate(d)(i => (0 until d).map(j => q(i)(j) * x(j)).sum)
      for (i <- 0 until d; j <- 0 until d) m(i)(j) += x(i) * y(j)
    }
    val r = Opq.procrustes(m)
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(r(i * d + j) - q(i)(j)) < 1e-8,
        s"R($i,$j)=${r(i * d + j)} vs Q=${q(i)(j)}")
  }

  test("procrustes output is exactly orthonormal even for rank-deficient M") {
    val d = 5
    // rank-1 M
    val m = Array.tabulate(d, d)((i, j) => (i + 1.0) * (j + 1.0))
    val r = Opq.procrustes(m)
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(l => r(i * d + l) * r(j * d + l)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"RRᵀ($i,$j)=$dot")
    }
  }

  test("full OPQ cuts quantization error strictly below the parametric init") {
    def totalErr(rounds: Int): Double = {
      val model = Opq.fit(raw, "vec_id", "v", dims = 8, m = 4, k = 8,
        pqIters = 5, rounds = rounds)
      Opq.encode(raw, "vec_id", "v", model).agg(avg($"err")).as[Double].head()
    }
    // rounds=1 IS the parametric init (balancedForPq rotation + one
    // codebook training, no Procrustes update) — the PcaSpec baseline
    val eInit = totalErr(1)
    val eOpq = totalErr(3)
    assert(eOpq < eInit,
      s"alternating rounds must improve on the parametric init: " +
        s"init=$eInit opq=$eOpq")
    // and the improvement is material, not ulps
    assert(eOpq < eInit * 0.995, s"init=$eInit opq=$eOpq")
  }

  test("learned rotation stays orthonormal and encode reconstructs") {
    val model = Opq.fit(raw, "vec_id", "v", dims = 8, m = 4, k = 8,
      pqIters = 3, rounds = 2)
    val d = model.dims
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(l =>
        model.rotation(i * d + l) * model.rotation(j * d + l)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9)
    }
    val out = Opq.encode(raw, "vec_id", "v", model)
    assert(out.count() === 3000)
    assert(out.filter($"err" < 0).count() === 0)
    // rotation applies through the native codegen'd kernel
    val plan = raw.select(
      Opq.rotate($"v", model.rotation, model.mean, d))
      .queryExecution.executedPlan.toString
    assert(plan.contains("rotatevec"), s"missing native node:\n$plan")
  }

  test("cross-moments are partitioning-invariant and match a driver fold") {
    val small = rows.take(500).toDF("vec_id", "v")
    def flat(parts: Int) = small.repartition(parts)
      .select(Bridge.toColumn(
        CrossMoments(Bridge.toEagerExpression($"v"),
          Bridge.toEagerExpression($"v"), 8).toAggregateExpression()))
      .head().getSeq[Double](0)
    val a = flat(1); val b = flat(13)
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-6 * (1 + math.abs(x))) }
    assert(a(0) === 500.0)
    // Σ a_i b_j at (i=2, j=5) against the exact driver fold
    val exact = rows.take(500).map { case (_, v) => v(2) * v(5) }.sum
    assert(math.abs(a(1 + 8 + 2 * 8 + 5) - exact) <=
      1e-6 * (1 + math.abs(exact)))
  }
}
