package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Gini semantics: 0 on perfect equality, the worked one-holder
  * example, permutation/tie stability, and zero-sum groups dropped.
  */
class InequalitySpec extends SparkSpec {
  import spark.implicits._

  private def g(rows: Seq[(String, Long)]) =
    Inequality.gini(
      rows.zipWithIndex.map { case ((grp, x), i) => (grp, x, i.toLong) }
        .toDF("g", "x", "tie"),
      Seq("g"), col("x"), col("tie"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap

  test("perfect equality scores 0; one holder of everything ~ (n-1)/n") {
    val m = g(Seq.fill(6)(("eq", 10L)) ++
      Seq(("one", 0L), ("one", 0L), ("one", 0L), ("one", 10L)))
    assert(m("eq") === ((6L, 60L, 0.0)))
    // [0,0,0,10]: ranks 1..4, six=40 → (80 − 5·10)/(4·10) = 0.75
    assert(m("one") === ((4L, 10L, 0.75)))
  }

  test("gini is invariant under input permutation and ties") {
    val base = Seq(5L, 1L, 3L, 3L, 8L, 0L).map(("g", _))
    assert(g(base)("g") === g(base.reverse)("g"))
  }

  test("zero-sum groups are dropped") {
    val m = g(Seq(("z", 0L), ("z", 0L), ("ok", 1L), ("ok", 3L)))
    assert(!m.contains("z"))
    // [1,3]: six = 1 + 6 = 7 → (14 − 3·4)/(2·4) = 0.25
    assert(m("ok") === ((2L, 4L, 0.25)))
  }
}
