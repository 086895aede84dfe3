package graft.ops

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (region, fine band, coarse band, entity, sensitive)
  private def df(rows: Seq[(String, Long, Long, Long, String)]) =
    rows.toDF("reg", "fine", "coarse", "ent", "sens")

  private def run(rows: Seq[(String, Long, Long, Long, String)],
      k: Long = 2, l: Long = 2) =
    Privacy.generalize(df(rows), Seq("reg"), "fine", "coarse", "ent", "sens",
      k, l).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getInt(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))

  test("passing class releases at level 0 with full resolution") {
    val out = run(Seq(
      ("a", 100L, 0L, 1L, "x"), ("a", 100L, 0L, 2L, "y")))
    assert(out.toSeq == Seq(("a", 100L, 0, 2L, 2L, false)))
  }

  test("failing fine classes merge at the coarse rung") {
    // two singleton fine classes under one coarse band: fail level 0,
    // pass together at level 1
    val out = run(Seq(
      ("a", 100L, 0L, 1L, "x"), ("a", 200L, 0L, 2L, "y")))
    assert(out.toSeq == Seq(("a", 0L, 1, 2L, 2L, false)))
  }

  test("suppression rung catches coarse failures; residue flags risky") {
    // distinct coarse bands, so level 1 also fails; level 2 merges
    // them under the stable QI — k passes but l=1 stays risky
    val out = run(Seq(
      ("a", 100L, 0L, 1L, "x"), ("a", 9000L, 5000L, 2L, "x")))
    assert(out.toSeq == Seq(("a", -1L, 2, 2L, 1L, true)))
  }

  test("local recoding: a passing class is untouched by failing siblings") {
    val out = run(Seq(
      ("a", 100L, 0L, 1L, "x"), ("a", 100L, 0L, 2L, "y"), // passes fine
      ("a", 200L, 0L, 3L, "x"), // fails alone, suppresses alone
      ("b", 100L, 0L, 4L, "x"), ("b", 100L, 0L, 5L, "y"))) // other stable QI
    val byKey = out.map(t => (t._1, t._2, t._3) -> t).toMap
    assert(byKey(("a", 100L, 0))._6 == false)
    assert(byKey(("b", 100L, 0))._6 == false)
    // the lone member rides the ladder to suppression and stays risky
    assert(byKey(("a", -1L, 2)) == (("a", -1L, 2, 1L, 1L, true)))
    assert(out.length == 3)
  }

  test("l-diversity alone can fail a k-passing class") {
    val out = run(Seq(
      ("a", 100L, 0L, 1L, "x"), ("a", 100L, 0L, 2L, "x"),
      ("a", 9000L, 5000L, 3L, "y"), ("a", 9000L, 5000L, 4L, "y")))
    // both classes have k=2 but l=1 → both suppress, merged class has l=2
    assert(out.toSeq == Seq(("a", -1L, 2, 4L, 2L, false)))
  }
}
