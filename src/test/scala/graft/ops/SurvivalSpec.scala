package graft.ops

import graft.SparkSpec

/** Kaplan–Meier semantics on the classic worked example: censoring
  * removes from the risk set without counting as an event, death
  * times drop the curve by (n−d)/n, and censor-only times keep it
  * flat.
  */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def km(rows: Seq[(String, Long, Boolean)]) =
    Survival.kaplanMeier(rows.toDF("cohort", "dur", "observed"),
      "cohort", "dur", "observed")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap

  test("worked example: deaths at 1,2,3 with a censor at 2") {
    val m = km(Seq(("a", 1L, true), ("a", 2L, true),
      ("a", 2L, false), ("a", 3L, true)))
    assert(m(("a", 1L)) === ((4L, 1L, 0L, 0.75)))
    assert(m(("a", 2L)) === ((3L, 1L, 1L, 0.5)))
    assert(m(("a", 3L)) === ((1L, 1L, 0L, 0.0)))
  }

  test("censor-only times keep survival flat but shrink the risk set") {
    val m = km(Seq(("a", 1L, true), ("a", 2L, false), ("a", 3L, true)))
    assert(m(("a", 1L)) === ((3L, 1L, 0L, 0.666667)))
    assert(m(("a", 2L)) === ((2L, 0L, 1L, 0.666667)))
    assert(m(("a", 3L)) === ((1L, 1L, 0L, 0.0)))
  }

  test("cohorts fold independently") {
    val m = km(Seq(("a", 1L, true), ("a", 2L, true),
      ("b", 1L, true), ("b", 1L, true)))
    assert(m(("a", 1L))._4 === 0.5)
    assert(m(("b", 1L)) === ((2L, 2L, 0L, 0.0)))
  }

  test("no deaths means survival stays 1") {
    val m = km(Seq(("a", 5L, false), ("a", 9L, false)))
    assert(m(("a", 5L))._4 === 1.0 && m(("a", 9L))._4 === 1.0)
  }
}
