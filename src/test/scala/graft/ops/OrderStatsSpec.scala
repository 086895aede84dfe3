package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Order-statistic semantics: median/CI ranks on hand-sized groups,
  * the exact conformal rank rule, and coverage counting.
  */
class OrderStatsSpec extends SparkSpec {
  import spark.implicits._

  test("median CI picks the normal-approximation order statistics") {
    // n=9: l = max(1, floor((9 − 1.96·3)/2)) = max(1, floor(1.56)) = 1
    // u = 9; median rank = 5
    val rows = (1L to 9L).map(v => ("g", v * 10, v))
    val r = OrderStats.medianCi(rows.toDF("g", "x", "tie"),
      Seq("g"), col("x"), col("tie")).head()
    assert(r.getLong(1) === 9L)
    assert(r.getLong(2) === 50L) // median
    assert(r.getLong(3) === 10L) // ci_lo = rank 1
    assert(r.getLong(4) === 90L) // ci_hi = rank 9
  }

  test("median CI tightens as n grows") {
    val rows = (1L to 100L).map(v => ("g", v, v))
    val r = OrderStats.medianCi(rows.toDF("g", "x", "tie"),
      Seq("g"), col("x"), col("tie")).head()
    // l = floor((100 − 19.6)/2) = 40, u = 61
    assert(r.getLong(2) === 50L)
    assert(r.getLong(3) === 40L && r.getLong(4) === 61L)
  }

  test("conformal threshold: exact ceil rank and coverage count") {
    // calib nc = 10,20,...,190 (n=19): k = ceil(20·0.9) = 18 → q=180
    val calib = (1L to 19L).map(v => (v * 10, true, v))
    val test = Seq((175L, false, 100L), (181L, false, 101L),
      (10L, false, 102L), (999L, false, 103L))
    val r = OrderStats.conformal((calib ++ test).toDF("nc", "cal", "tie"),
      col("nc"), col("cal"), col("tie")).head()
    assert(r.getLong(0) === 19L && r.getLong(1) === 18L)
    assert(r.getLong(2) === 180L)
    assert(r.getLong(3) === 4L && r.getLong(4) === 2L)
    assert(r.getDouble(5) === 0.5)
  }
}
