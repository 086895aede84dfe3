package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the round-15 statistics family against hand-computed textbook
  * values (cross-checked offline with the standard formulas): Welch
  * t / Welch–Satterthwaite df, tie-corrected Mann–Whitney z, one-way
  * ANOVA F + η², Spearman ρ, Mann–Kendall z, Theil–Sen slope, lagged
  * ACF, and Adamic–Adar link prediction on a 4-node graph.
  */
class HypoTestsSpec extends SparkSpec {
  import spark.implicits._

  test("Welch t on unequal samples matches the textbook value") {
    val df = (Seq(10L, 12L, 14L, 16L).map(x => (true, x)) ++
      Seq(9L, 9L, 11L).map(x => (false, x))).toDF("a", "x")
    val r = HypoTests.welchT(df, col("a"), col("x")).head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 13.0 && math.abs(r.getDouble(3) - 9.666667) < 1e-6)
    assert(math.abs(r.getDouble(4) - 2.294157) < 1e-6) // t
    assert(math.abs(r.getDouble(5) - 4.349398) < 1e-6) // df
  }

  test("Mann-Whitney with ties: doubled ranks, tie cube, z") {
    val df = (Seq(1L, 2L, 2L, 5L).map(x => (true, x)) ++
      Seq(2L, 3L, 4L).map(x => (false, x))).toDF("a", "x")
    val r = HypoTests.mannWhitney(df, col("a"), col("x")).head()
    assert(r.getLong(0) === 4L && r.getLong(1) === 3L)
    assert(r.getLong(2) === 8L)   // 2·U_A
    assert(r.getLong(3) === 24L)  // Σ(t³−t): the triple tie at 2
    assert(math.abs(r.getDouble(4) - (-0.733799)) < 1e-6)
  }

  test("one-way ANOVA F and eta^2 on three small groups") {
    val df = (Seq(1L, 2L, 3L).map(("g1", _)) ++ Seq(2L, 3L, 4L).map(("g2", _)) ++
      Seq(5L, 6L, 7L).map(("g3", _))).toDF("g", "x")
    val r = HypoTests.anovaF(df, col("g"), col("x")).head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 9L)
    assert(math.abs(r.getDouble(2) - 0.8125) < 1e-6) // η²
    assert(math.abs(r.getDouble(3) - 13.0) < 1e-6)   // F
  }

  test("Kruskal-Wallis: no-tie H, tie-corrected H, 2-group = Mann-Whitney") {
    // {1,2} vs {3,4}: ranks 1..4, R_a=3, R_b=7
    // H = 12/(4·5)·(9/2 + 49/2) − 3·5 = 2.4, no ties
    val clean = (Seq(1L, 2L).map(("a", _)) ++ Seq(3L, 4L).map(("b", _)))
      .toDF("g", "x")
    val r1 = HypoTests.kruskalWallis(clean, col("g"), col("x")).head()
    assert(r1.getLong(0) === 2L && r1.getLong(1) === 4L)
    assert(r1.getLong(2) === 0L)
    assert(math.abs(r1.getDouble(3) - 2.4) < 1e-6)
    // ε² = (H − k + 1)/(n − k) = (2.4 − 1)/2 = 0.7
    assert(math.abs(r1.getDouble(4) - 0.7) < 1e-6)
    // {1,1} vs {2,3}: avg ranks 1.5,1.5,3,4 → same R's, tcube = 6,
    // H = 2.4 / (1 − 6/60) = 2.666667
    val tied = (Seq(1L, 1L).map(("a", _)) ++ Seq(2L, 3L).map(("b", _)))
      .toDF("g", "x")
    val r2 = HypoTests.kruskalWallis(tied, col("g"), col("x")).head()
    assert(r2.getLong(2) === 6L)
    assert(math.abs(r2.getDouble(3) - 2.666667) < 1e-6)
    // k = 2 must agree with Mann-Whitney's z: H = z² asymptotically
    // EXACTLY for the tie-corrected pair (both are the same rank sum)
    val mw = HypoTests.mannWhitney(tied, col("g") === "a", col("x")).head()
    assert(math.abs(r2.getDouble(3) - mw.getDouble(4) * mw.getDouble(4)) < 1e-4)
  }

  test("Brown-Forsythe: odd-n medians, even-n half-integer median") {
    // g1 = {1,2,9} (median 2, |dev| = 1,0,7), g2 = {4,5,6} (median 5,
    // |dev| = 1,0,1): SSB = 6, SSW = 264/9 → F = 6/(29.333/4) =
    // 0.818182, eta^2 = 6/35.333 = 0.169811
    val odd = (Seq(1L, 2L, 9L).map(("g1", _)) ++ Seq(4L, 5L, 6L).map(("g2", _)))
      .toDF("g", "x")
    val r1 = HypoTests.brownForsythe(odd, col("g"), col("x")).head()
    assert(r1.getLong(0) === 2L && r1.getLong(1) === 6L)
    assert(math.abs(r1.getDouble(2) - 0.818182) < 1e-6)
    assert(math.abs(r1.getDouble(3) - 0.169811) < 1e-6)
    // g1 = {1,2,3,10} (median 2.5 — the half-integer doubled-median
    // path), g2 = {4,6} (median 5): F = 3/(34/4) = 0.352941
    val even = (Seq(1L, 2L, 3L, 10L).map(("g1", _)) ++ Seq(4L, 6L).map(("g2", _)))
      .toDF("g", "x")
    val r2 = HypoTests.brownForsythe(even, col("g"), col("x")).head()
    assert(math.abs(r2.getDouble(2) - 0.352941) < 1e-6)
  }

  test("Spearman rho on a known permutation; constant axis dropped") {
    val df = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L), (5L, 5L))
      .map { case (x, y) => ("g", x, y) }.toDF("g", "x", "y")
    val r = RankCorr.spearmanByGroup(df, Seq("g"), col("x"), col("y")).head()
    assert(r.getLong(1) === 5L)
    assert(math.abs(r.getDouble(2) - 0.8) < 1e-6)
    // constant y: group must be dropped, not NaN
    val const = Seq(("c", 1L, 7L), ("c", 2L, 7L), ("c", 3L, 7L))
      .toDF("g", "x", "y")
    assert(RankCorr.spearmanByGroup(const, Seq("g"), col("x"), col("y"))
      .count() === 0L)
  }

  test("Mann-Kendall on a strictly increasing series") {
    val df = (1 to 5).map(i => ("g", i, i.toLong * 10)).toDF("g", "t", "y")
    val r = TrendRobust.mannKendall(df, Seq("g")).head()
    assert(r.getLong(1) === 5L)
    assert(r.getLong(2) === 10L) // all 10 pairs concordant
    assert(math.abs(r.getDouble(3) - 16.666667) < 1e-6)
    assert(math.abs(r.getDouble(4) - 2.204541) < 1e-6)
  }

  test("Theil-Sen recovers the slope of a clean line with one outlier") {
    // y = 3t except t=4 shot to 1000: the median slope stays 3
    val df = Seq(("g", 1, 3L), ("g", 2, 6L), ("g", 3, 9L), ("g", 4, 1000L),
      ("g", 5, 15L)).toDF("g", "t", "y")
    val r = TrendRobust.theilSen(df, Seq("g")).head()
    assert(r.getLong(1) === 10L)
    assert(r.getLong(2) === 3000000L) // ppm
    assert(r.getDouble(3) === 3.0)
  }

  test("ACF: an exact 2-periodic series has r = -1 at lag 1, +1 at lag 2") {
    val ys = Seq(1L, 5L, 1L, 5L, 1L, 5L, 1L, 5L)
    val df = ys.zipWithIndex.map { case (y, i) => ("g", i + 1, y) }
      .toDF("g", "t", "y")
    val m = TrendRobust.acf(df, Seq("g"), maxLag = 2).collect()
      .map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(math.abs(m(1) - (-1.0)) < 1e-6)
    assert(math.abs(m(2) - 1.0) < 1e-6)
  }

  test("Adamic-Adar on a path graph predicts the endpoints' closure") {
    // path 1—2—3—4 (symmetric): non-edges sharing a neighbor are
    // (1,3) via 2 and (2,4) via 3 — both centers have degree 2 —
    // and 1–4 share nothing
    val ed = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "t")
    val edges = ed.select(col("s").as("src"), col("t").as("dst"))
      .unionAll(ed.select(col("t").as("src"), col("s").as("dst")))
    val out = LinkPredict.adamicAdar(edges, k = 10).collect()
    assert(out.length === 2)
    val m = out.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // deg(center)=2 ⇒ AA = 1/log2(2) = 1, RA = 1/2; both endpoints
    // have degree 1 and 2 ⇒ jaccard = 1/(1+2−1) = 0.5
    assert(m((1L, 3L)) === ((1L, 1.0, 0.5, 0.5)))
    assert(m((2L, 4L))._2 === 1.0)
    // an existing edge must never be predicted
    assert(!m.contains((1L, 2L)) && !m.contains((2L, 3L)))
  }
}
