package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def state(rows: Seq[(Long, Long, String, String)]) =
    rows.toDF("key", "v", "payload", "op")

  test("latest version wins, tombstones drop, absent keys persist") {
    val base = state(Seq((1L, 10L, "one-v10", "u"), (2L, 10L, "two-v10", "u")))
    val delta = state(Seq(
      (1L, 11L, "one-v11", "u"),   // update key 1
      (2L, 12L, "ignored", "d"),   // delete key 2
      (3L, 11L, "three-v11", "u"), // insert key 3
      (3L, 12L, "three-v12", "u")  // then update it again
    ))
    val out = Upsert.applyChangelog(base, delta, Seq("key"), Seq("v"),
      col("op") === "d")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out == Map(1L -> "one-v11", 3L -> "three-v12"))
  }

  test("delete then re-insert in the same changelog keeps the re-insert") {
    val base = state(Seq((1L, 1L, "old", "u")))
    val delta = state(Seq((1L, 2L, "x", "d"), (1L, 3L, "new", "u")))
    val out = Upsert.applyChangelog(base, delta, Seq("key"), Seq("v"),
      col("op") === "d").collect()
    assert(out.length == 1 && out.head.getString(2) == "new")
  }

  test("stale changelog rows never overwrite a newer base row") {
    val base = state(Seq((1L, 5L, "newer", "u")))
    val delta = state(Seq((1L, 3L, "stale", "u")))
    val out = Upsert.applyChangelog(base, delta, Seq("key"), Seq("v"),
      col("op") === "d").collect()
    assert(out.head.getString(2) == "newer")
  }

  test("applying an empty changelog is the identity on live rows") {
    val base = state(Seq((1L, 1L, "a", "u"), (2L, 2L, "b", "u")))
    val out = Upsert.applyChangelog(base, base.limit(0), Seq("key"), Seq("v"),
      col("op") === "d")
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }
}
