package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // 4-d data with variance concentrated along (1,1,0,0)/√2 and a
  // smaller independent component on dim 2; dim 3 is ~constant
  private def data = {
    val rnd = new scala.util.Random(5)
    (1 to 2000).map { i =>
      val main = rnd.nextGaussian() * 10
      val second = rnd.nextGaussian() * 2
      (i.toLong, Array(main + rnd.nextGaussian() * 0.1,
        main + rnd.nextGaussian() * 0.1, second, 7.0))
    }
  }

  private lazy val df = data.toDF("vec_id", "v")
  private lazy val model = Pca.fit(df, "v", dim = 4)

  test("eigenvalues sort descending and concentrate the planted variance") {
    val ev = model.eigenvalues
    assert(ev === ev.sortBy(-_))
    assert(ev.head > 150 && ev.head < 250) // 2·var(main) ≈ 200
    assert(ev(1) > 2 && ev(1) < 8)         // var(second) ≈ 4
    assert(ev(3) < 0.1)                    // the constant dim
    // top component is ±(1,1,0,0)/√2, sign-normalized positive
    val b0 = model.basis.head
    assert(math.abs(b0(0) - math.sqrt(0.5)) < 0.01 &&
      math.abs(b0(1) - math.sqrt(0.5)) < 0.01)
    assert(math.abs(b0(2)) < 0.05 && math.abs(b0(3)) < 0.05)
  }

  test("basis is orthonormal; full-rank rotation preserves centered norms") {
    val d = model.basis.length
    for (i <- 0 until d; j <- 0 until d) {
      val dot = model.basis(i).zip(model.basis(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"basis not orthonormal at ($i,$j): $dot")
    }
    val rotated = df.select($"vec_id", Pca.transform($"v", model, k = 4).as("r"))
      .as[(Long, Array[Double])].collect().toMap
    val orig = data.toMap
    orig.foreach { case (id, v) =>
      val centered = v.zip(model.mean).map { case (x, m) => x - m }
      val n0 = math.sqrt(centered.map(x => x * x).sum)
      val n1 = math.sqrt(rotated(id).map(x => x * x).sum)
      assert(math.abs(n0 - n1) < 1e-6 * (1 + n0))
    }
  }

  test("top-k projection captures the planted structure; expression codegens") {
    val proj = df.select(Pca.transform($"v", model, k = 1).as("p"))
      .select(element_at($"p", 1)).as[Double].collect()
    // variance along PC1 ≈ λ1
    val mean = proj.sum / proj.length
    val varP = proj.map(x => (x - mean) * (x - mean)).sum / proj.length
    assert(math.abs(varP - model.eigenvalues.head) / model.eigenvalues.head < 0.01)
    val plan = df.select(Pca.transform($"v", model, 2))
      .queryExecution.executedPlan.toString
    assert(plan.contains("rotatevec"), s"missing native node:\n$plan")
  }

  test("whitened projection has ~identity covariance on informative dims") {
    val w = df.select(Pca.whiten($"v", model, k = 3).as("w"))
      .as[Array[Double]].collect()
    val n = w.length
    for (i <- 0 until 3; j <- 0 until 3) {
      val mi = w.map(_(i)).sum / n; val mj = w.map(_(j)).sum / n
      val cov = w.map(v => (v(i) - mi) * (v(j) - mj)).sum / n
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cov - want) < 0.02, s"whitened cov($i,$j)=$cov")
    }
  }

  test("OPQ-lite: rotated+balanced PQ beats PQ on raw correlated vectors") {
    // 8-dim data = independent latents of very different scales mixed
    // by a fixed rotation → strong cross-subspace correlation
    val rnd = new scala.util.Random(9)
    val scales = Array(12.0, 9.0, 6.0, 4.0, 2.0, 1.0, 0.5, 0.25)
    val mix = Pca.jacobi(Array.tabulate(8, 8)((i, j) =>
      math.sin(i * 3 + j * 7).abs + (if (i == j) 2.0 else 0.0)))._2
    val rows = (1 to 3000).map { i =>
      val z = scales.map(_ * rnd.nextGaussian())
      val x = Array.tabulate(8)(r =>
        (0 until 8).map(c => mix(r)(c) * z(c)).sum)
      (i.toLong, x)
    }
    val raw = rows.toDF("vec_id", "v")
    val pm = Pca.balancedForPq(Pca.fit(raw, "v", 8), m = 4)
    val rotated = raw.select($"vec_id",
      Pca.transform($"v", pm, k = 8).as("v"))
    def avgErr(df: org.apache.spark.sql.DataFrame): Double =
      ProductQuantizer
        .fitEncode(df, "vec_id", "v", dims = 8, m = 4, k = 8, iters = 5)
        .agg(avg($"err")).as[Double].head()
    val eRaw = avgErr(raw)
    val eRot = avgErr(rotated)
    assert(eRot < eRaw * 0.9,
      s"rotation should cut PQ quantization error: raw=$eRaw rot=$eRot")
  }

  test("covariance moments are partitioning-invariant and match the driver") {
    val flat = (parts: Int) => df.repartition(parts)
      .select(org.apache.spark.sql.graftbridge.Bridge.toColumn(
        CovMoments(org.apache.spark.sql.graftbridge.Bridge
          .toEagerExpression($"v"), 4).toAggregateExpression()))
      .head().getSeq[Double](0)
    val a = flat(1); val b = flat(13)
    a.zip(b).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-6 * (1 + math.abs(x))) }
    // n and Σx against an exact driver fold
    assert(a(0) === 2000.0)
    val exact = data.map(_._2(2)).sum
    assert(math.abs(a(1 + 2) - exact) < 1e-6 * (1 + math.abs(exact)))
    // float input works too (the embeddings table's element type)
    val f = data.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "v")
    assert(Pca.fit(f, "v", 4).eigenvalues.head > 150)
  }
}
