package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies added / removed / changed / unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "text")
    val cur = Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("k", "text")
    val out = SnapshotDiff.diff(old, cur, Seq("k"), md5($"text"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(
      1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("multi-column keys and struct fingerprints") {
    val old = Seq(("s1", 1L, "a", 10), ("s1", 2L, "b", 20)).toDF("src", "id", "t", "n")
    val cur = Seq(("s1", 1L, "a", 10), ("s1", 2L, "b", 99)).toDF("src", "id", "t", "n")
    val out = SnapshotDiff.diff(old, cur, Seq("src", "id"),
        md5(to_json(struct($"t", $"n"))))
      .select($"id", $"status").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("empty old marks everything added; empty current marks everything removed") {
    val old = Seq((1L, "a")).toDF("k", "text")
    val none = old.limit(0)
    assert(SnapshotDiff.diff(none, old, Seq("k"), md5($"text"))
      .select($"status").as[String].collect().toList === List("added"))
    assert(SnapshotDiff.diff(old, none, Seq("k"), md5($"text"))
      .select($"status").as[String].collect().toList === List("removed"))
  }

  test("NULL fingerprints are content, not absence") {
    val old = Seq[(Long, String)]((1L, null), (2L, null), (3L, "x"))
      .toDF("k", "text")
    val cur = Seq[(Long, String)]((1L, "x"), (2L, null), (3L, null))
      .toDF("k", "text")
    val out = SnapshotDiff.diff(old, cur, Seq("k"), md5($"text"))
      .as[(Long, String)].collect().toMap
    // a key present on both sides is NEVER added/removed, whatever its
    // fingerprint; NULL <=> NULL is unchanged, NULL vs value is changed
    assert(out === Map(1L -> "changed", 2L -> "unchanged", 3L -> "changed"))
  }

  test("output carries keys + status only; wide columns never cross the join") {
    val old = Seq((1L, "a", "huge")).toDF("k", "text", "blob")
    val cur = Seq((1L, "b", "huge")).toDF("k", "text", "blob")
    val df = SnapshotDiff.diff(old, cur, Seq("k"), md5($"text"))
    assert(df.columns.toList === List("k", "status"))
    // the pre-join projections reduce each side to key + fingerprint:
    // no attribute named text/blob survives into the optimized join
    val joined = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.head
    val joinAttrs = joined.children.flatMap(_.output).map(_.name)
    assert(!joinAttrs.exists(n => n == "text" || n == "blob"), joinAttrs)
  }
}
