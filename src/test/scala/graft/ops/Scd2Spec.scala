package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def hist(rows: Seq[(String, Long, String)]) =
    Scd2.build(rows.toDF("k", "ts", "attr"),
        keyCols = Seq("k"), tsCol = "ts", attrCols = Seq("attr"))
      .orderBy($"k", $"version")
      .as[(String, String, Long, Option[Long], Long, Boolean)]
      .collect().toList

  test("runs collapse; intervals chain; only the last version is current") {
    val out = hist(Seq(
      ("a", 1L, "x"), ("a", 2L, "x"), ("a", 3L, "y"),
      ("a", 5L, "y"), ("a", 8L, "x")))
    assert(out === List(
      ("a", "x", 1L, Some(3L), 1L, false),
      ("a", "y", 3L, Some(8L), 2L, false),
      ("a", "x", 8L, None, 3L, true)))
    // half-open chaining: valid_to of v equals valid_from of v+1
    out.sliding(2).foreach {
      case List(prev, next) => assert(prev._4 === Some(next._3))
      case _ =>
    }
  }

  test("NULL transitions are changes; NULL runs still collapse") {
    val rows = Seq[(String, Long, Option[String])](
      ("a", 1L, Some("x")), ("a", 2L, None), ("a", 3L, None),
      ("a", 4L, Some("x"))).toDF("k", "ts", "attr")
    val out = Scd2.build(rows, Seq("k"), "ts", Seq("attr"))
      .orderBy($"version")
      .select($"attr", $"version").as[(Option[String], Long)].collect().toList
    // x -> NULL -> (NULL collapses) -> x : three versions
    assert(out === List((Some("x"), 1L), (None, 2L), (Some("x"), 3L)))
  }

  test("multi-attribute change detection: any differing attr opens a version") {
    val rows = Seq(("a", 1L, "x", 10), ("a", 2L, "x", 20), ("a", 3L, "x", 20))
      .toDF("k", "ts", "s", "n")
    val out = Scd2.build(rows, Seq("k"), "ts", Seq("s", "n"))
    assert(out.count() === 2) // n: 10 -> 20 is a change even with s stable
  }

  test("keys version independently") {
    val out = hist(Seq(("a", 1L, "x"), ("b", 1L, "x"), ("b", 2L, "y")))
    assert(out.map(r => (r._1, r._5)) === List(("a", 1L), ("b", 1L), ("b", 2L)))
    assert(out.count(_._6) === 2) // one open interval per key
  }

  test("tie columns order equal timestamps deterministically") {
    val rows = Seq(("a", 1L, 2, "y"), ("a", 1L, 1, "x"), ("a", 2L, 3, "y"))
      .toDF("k", "ts", "seq", "attr")
    val out = Scd2.build(rows, Seq("k"), "ts", Seq("attr"), tieCols = Seq("seq"))
      .orderBy($"version").select($"attr").as[String].collect().toList
    assert(out === List("x", "y")) // seq=1 ("x") first, then "y" run
  }
}
