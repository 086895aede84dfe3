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

  private def lr(rows: Seq[(Boolean, Long, Boolean)]) =
    Survival.logRank(rows.toDF("arm", "dur", "observed"),
      "arm", "dur", "observed").head()

  test("log-rank: identical arms give chi2 = 0") {
    val arm = Seq((1L, true), (2L, true), (3L, true), (4L, false))
    val r = lr(arm.map { case (d, o) => (true, d, o) } ++
      arm.map { case (d, o) => (false, d, o) })
    // symmetric arms: O1 = E1 exactly
    assert(r.getLong(0) === 3L && r.getDouble(2) === 3.0)
    assert(r.getDouble(5) === 0.0)
  }

  test("log-rank: worked 2x2 example") {
    // arm A dies at t=1 (n=2 at risk: one A one B); arm B dies at t=2
    // t=1: d=1, n1=1, n2=1 → e1 term = 0.5, v term = 0.25
    // t=2: d=1, n1=0, n2=1 → e1 term = 0,   v term = 0
    val r = lr(Seq((true, 1L, true), (false, 2L, true)))
    assert(r.getLong(0) === 1L)            // o1
    assert(r.getDouble(2) === 0.5)         // e1
    assert(r.getDouble(4) === 0.25)        // v
    assert(r.getDouble(5) === 1.0)         // chi2 = (1-0.5)^2/0.25
  }

  test("log-rank: censored entities join risk sets but not deaths") {
    // censoring an extra A at t=3 changes risk sets, not O1
    val base = Seq((true, 1L, true), (false, 2L, true))
    val withCens = lr(base :+ (true, 3L, false))
    assert(withCens.getLong(0) === 1L)
    // t=1: n1=2, n2=1 → term 2/3 (micro-rounded); t=2: n1=1, n2=1
    // (the censored A is still at risk) → term 1/2; e1 = 1.166667
    assert(withCens.getDouble(2) === 1.166667)
  }
}
