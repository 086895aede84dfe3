package graft.ops

import graft.SparkSpec

/** Drift-monitor semantics on planted distributions: identical
  * snapshots score 0, disjoint supports score 1, a shifted source
  * scores strictly above an unshifted one, and one-sided groups are
  * excluded (membership change, not drift).
  */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def tv(old: Seq[(String, Double)], cur: Seq[(String, Double)]) =
    Drift.histogramDrift(
      old.toDF("src", "v"), cur.toDF("src", "v"),
      "src", "v", lo = 0.0, hi = 1.0, bins = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap

  test("drift binning is locked to the quantile-sketch binning") {
    // the two families re-implement the clamped equal-width bin; this
    // law pins them semantically identical on edges, outliers, NULLs
    val df = Seq[(String, java.lang.Double)](
      ("g", 0.0), ("g", 9.999), ("g", 10.0), ("g", -5.0), ("g", 42.0),
      ("g", 1.25), ("g", null), ("h", 5.0))
      .toDF("g", "v")
    val viaDrift = Drift.histogram(df, Seq("g"), "v", 0.0, 10.0, 8)
      .as[(String, Int, Long)].collect().toSet
    val viaQh = graft.sketch.QuantileHist
      .counters(df, Seq("g"), "v", 0.0, 10.0, 8)
      .as[(String, Int, Long)].collect().toSet
    assert(viaDrift === viaQh)
  }

  test("identical distributions drift 0; disjoint supports drift 1") {
    val a = (0 until 100).map(i => ("s", (i % 10) / 10.0 + 0.05))
    assert(tv(a, a)("s") === 0.0)
    val lowHalf = (0 until 50).map(i => ("s", 0.1 + (i % 3) * 0.1))
    val highHalf = (0 until 50).map(i => ("s", 0.6 + (i % 3) * 0.1))
    assert(tv(lowHalf, highHalf)("s") === 1.0)
  }

  test("a shifted source outscores an unshifted one; one-sided groups drop") {
    val stable = (0 until 200).map(i => ("stable", (i % 10) / 10.0 + 0.03))
    val shiftOld = (0 until 200).map(i => ("shifted", (i % 5) / 10.0 + 0.03))
    val shiftNew = (0 until 200).map(i => ("shifted", (i % 5) / 10.0 + 0.43))
    val gone = (0 until 50).map(i => ("removed", 0.5))
    val born = (0 until 50).map(i => ("added", 0.5))
    val out = tv(stable ++ shiftOld ++ gone, stable ++ shiftNew ++ born)
    assert(out.keySet === Set("stable", "shifted")) // membership changes excluded
    assert(out("stable") === 0.0)
    assert(out("shifted") > 0.5, s"shifted tv ${out("shifted")}")
  }

  test("counts reported per side; NULL values dropped") {
    val old = Seq(("s", 0.2), ("s", 0.4), ("s", 0.9))
    val cur = Seq(("s", 0.2), ("s", 0.4))
    val row = Drift.histogramDrift(
      old.toDF("src", "v"),
      cur.toDF("src", "v").unionByName(
        Seq(("s", Option.empty[Double])).toDF("src", "v")),
      "src", "v", 0.0, 1.0, 10).collect().head
    assert(row.getLong(1) === 3L && row.getLong(2) === 2L) // null row dropped
  }
}
