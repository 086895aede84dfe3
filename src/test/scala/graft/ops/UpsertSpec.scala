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

  test("changelog application is idempotent: re-applying changes nothing") {
    val base = state(Seq((1L, 10L, "one", "u"), (2L, 10L, "two", "u")))
    val delta = state(Seq((1L, 11L, "one-v11", "u"), (2L, 12L, "x", "d"),
      (3L, 11L, "three", "u")))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .sortBy(_._1).toSeq
    val once = Upsert.applyChangelog(base, delta, Seq("key"), Seq("v"),
      col("op") === "d")
    val twice = Upsert.applyChangelog(once, delta, Seq("key"), Seq("v"),
      col("op") === "d")
    assert(rows(once) == rows(twice))
  }

  test("retaining fold keeps the tombstone version for late-arrival defense") {
    val base = state(Seq((1L, 1L, "live", "u")))
      .withColumn("__deleted", org.apache.spark.sql.functions.lit(false))
    val delta = state(Seq((1L, 5L, "x", "d")))
    val snap = Upsert.applyChangelogRetain(base, delta, Seq("key"), Seq("v"),
      col("op") === "d")
    // the tombstone row survives with its version...
    val r = snap.collect()
    assert(r.length == 1 && r.head.getAs[Boolean]("__deleted")
      && r.head.getLong(1) == 5L)
    // ...so a stale pre-delete upsert cannot resurrect the key
    val late = Upsert.applyChangelogRetain(snap, state(Seq((1L, 3L, "stale", "u"))),
      Seq("key"), Seq("v"), col("op") === "d")
    assert(late.collect().head.getAs[Boolean]("__deleted"))
  }

  test("value column names containing a dot survive the struct roundtrip") {
    val base = Seq((1L, 10L, "a")).toDF("key", "v", "pay.load")
    val delta = Seq((1L, 11L, "b")).toDF("key", "v", "pay.load")
    val out = Upsert.applyChangelog(base, delta, Seq("key"), Seq("v"),
      org.apache.spark.sql.functions.lit(false))
    assert(out.columns.toSeq == Seq("key", "v", "pay.load"))
    assert(out.collect().map(_.getString(2)).toSeq == Seq("b"))
  }

  test("applying an empty changelog is the identity on live rows") {
    val base = state(Seq((1L, 1L, "a", "u"), (2L, 2L, "b", "u")))
    val out = Upsert.applyChangelog(base, base.limit(0), Seq("key"), Seq("v"),
      col("op") === "d")
    assert(out.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }
}
