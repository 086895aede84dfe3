package graft.ops

import graft.SparkSpec

/** PAV laws on hand-computed bin tables: already-monotone input is
  * untouched, a single violation pools to the weighted mean, cascades
  * resolve to the textbook fixpoint, and the output is always
  * non-decreasing.
  */
class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def pav(rows: Seq[(Long, Long, Long)]) =
    Isotonic.pavBins(rows.toDF("bin", "n", "n_pos"), "bin", "n", "n_pos",
      maxBins = rows.size)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getDouble(4)))
      .toMap
      .map { case (k, v) => k -> v }

  test("monotone input passes through: every bin is its own pool") {
    val m = pav(Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 9L)))
    assert(m(0L) === ((0L, 0.1)))
    assert(m(1L) === ((1L, 0.5)))
    assert(m(2L) === ((2L, 0.9)))
  }

  test("single violation pools to the weighted mean") {
    // rates 0.8 then 0.2 with weights 10, 30 → pooled (8+6)/40 = 0.35
    val m = pav(Seq((0L, 10L, 8L), (1L, 30L, 6L)))
    assert(m(0L) === ((0L, 0.35)) && m(1L) === ((0L, 0.35)))
  }

  test("cascade: a merge can trigger an earlier violation") {
    // rates 0.5, 0.9, 0.1 (equal weights): pooling (0.9,0.1)→0.5 ties
    // with bin0 (0.5 > 0.5 false, strict test) → two pools [0.5][0.5]
    val tie = pav(Seq((0L, 10L, 5L), (1L, 10L, 9L), (2L, 10L, 1L)))
    assert(tie(0L)._2 === 0.5 && tie(1L)._2 === 0.5 && tie(2L)._2 === 0.5)
    assert(tie(0L)._1 === 0L && tie(1L)._1 === 1L && tie(2L)._1 === 1L)
    // rates 0.6, 0.9, 0.0: pool(0.9,0.0)=0.45 < 0.6 → all one pool 0.5
    val m = pav(Seq((0L, 10L, 6L), (1L, 10L, 9L), (2L, 10L, 0L)))
    assert(Seq(0L, 1L, 2L).forall(b => m(b) === ((0L, 0.5))))
  }

  test("output is non-decreasing on an adversarial zig-zag") {
    val m = pav(Seq((0L, 5L, 4L), (1L, 7L, 1L), (2L, 3L, 3L),
      (3L, 9L, 2L), (4L, 2L, 2L)))
    val rates = (0L to 4L).map(m(_)._2)
    assert(rates === rates.sorted)
    // mass is conserved: Σ w·fitted = Σ s (up to the 1e-6 rounding)
    val ws = Seq(5L, 7L, 3L, 9L, 2L)
    val total = (0 until 5).map(i => ws(i) * m(i.toLong)._2).sum
    assert(math.abs(total - 12.0) < 1e-4)
  }
}
