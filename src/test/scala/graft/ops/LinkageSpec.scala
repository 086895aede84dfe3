package graft.ops

import graft.SparkSpec

/** Fellegi–Sunter scoring laws: full agreement dominates, full
  * disagreement is filtered, blocking bounds candidates, and the
  * all-distinct-field u clamp keeps weights finite.
  */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private val m = Map("f1" -> 0.9, "f2" -> 0.8)

  private def link(rows: Seq[(Long, String, String, String)],
      minScore: Double) =
    Linkage.fellegiSunter(rows.toDF("id", "blk", "f1", "f2"),
      "id", Seq("blk"), Seq("f1", "f2"), m, minScore)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getBoolean(2), r.getBoolean(3), r.getDouble(4)))
      .toMap

  test("agreeing pairs outscore disagreeing ones; ids ordered a < b") {
    val rows = Seq(
      (1L, "B", "x", "p"), (2L, "B", "x", "p"), // full agreement
      (3L, "B", "y", "q"), (4L, "B", "z", "r")) // full disagreement
    val all = link(rows, minScore = Double.NegativeInfinity)
    assert(all.keys.forall { case (a, b) => a < b })
    val agreeScore = all((1L, 2L))._3
    assert(all((1L, 2L))._1 && all((1L, 2L))._2)
    assert(all.values.forall(_._3 <= agreeScore))
    assert(agreeScore > all((3L, 4L))._3)
  }

  test("threshold filters; cross-block pairs never appear") {
    // the third row must DIFFER on the fields: if every record agreed
    // on a field, the corpus-estimated u would hit 1.0 and correctly
    // declare that field's agreement worthless
    val rows = Seq(
      (1L, "B1", "x", "p"), (2L, "B1", "x", "p"),
      (3L, "B2", "y", "q"))
    val linked = link(rows, minScore = 0.0)
    assert(linked.keySet === Set((1L, 2L)))
  }

  test("an all-distinct field u-clamps instead of producing infinity") {
    val rows = Seq(
      (1L, "B", "u1", "p"), (2L, "B", "u2", "p"), (3L, "B", "u3", "q"))
    val all = link(rows, minScore = Double.NegativeInfinity)
    assert(all.values.forall(v => !v._3.isInfinite && !v._3.isNaN))
  }
}
