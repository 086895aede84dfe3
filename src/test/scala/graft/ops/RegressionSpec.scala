package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Grouped-OLS semantics on hand-computed fixtures: exact fits on a
  * perfect line, the closed-form moments on a worked 3-point example,
  * and degenerate-x groups dropped.
  */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(String, Long, Long)]) =
    Regression.olsByGroup(rows.toDF("g", "x", "y"),
      Seq("g"), col("x"), col("y"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap

  test("perfect line recovers slope, intercept, r2 = 1") {
    val m = fit((1L to 5L).map(x => ("g", x, 2 * x + 3)))
    assert(m("g") === ((5L, 2.0, 3.0, 1.0)))
  }

  test("worked 3-point example matches the hand computation") {
    // x=[1,2,3], y=[2,2,5]: cov_n=9, varx_n=6, vary_n=18, inter_n=0
    val m = fit(Seq(("g", 1L, 2L), ("g", 2L, 2L), ("g", 3L, 5L)))
    assert(m("g") === ((3L, 1.5, 0.0, 0.75)))
  }

  test("constant-x groups are dropped; others survive") {
    val m = fit(Seq(("flat", 7L, 1L), ("flat", 7L, 9L),
      ("ok", 1L, 1L), ("ok", 2L, 2L)))
    assert(!m.contains("flat"))
    assert(m("ok") === ((2L, 1.0, 0.0, 1.0)))
  }

  test("negative relationships fit with negative slope") {
    val m = fit((1L to 4L).map(x => ("g", x, 10 - 2 * x)))
    assert(m("g")._2 === -2.0 && m("g")._4 === 1.0)
  }
}
