package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityChecksSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq[(java.lang.Long, java.lang.Double, String)](
    (1L, 5.0, "a"), (2L, -1.0, "b"), (3L, null, "c"),
    (null, 10.0, "d"), (1L, 200.0, "a")).toDF("k", "v", "tag")

  test("row checks count planted violations; NULL predicate counts as one") {
    val out = QualityChecks.report(df, Seq(
        "v_in_0_100" -> !$"v".between(0, 100), // -1, 200 AND the null v
        "k_not_null" -> $"k".isNull))
      .as[(String, Long)].collect().toMap
    assert(out("v_in_0_100") === 3L)
    assert(out("k_not_null") === 1L)
  }

  test("observed checks ride the caller's action, equal the report pass") {
    val checks = Seq(
      "v_in_0_100" -> !$"v".between(0, 100),
      "k_not_null" -> $"k".isNull)
    val (frame, obs) = QualityChecks.observed(df, "dq", checks)
    // the caller's OWN action: a write — no separate metrics scan
    val dir = java.nio.file.Files.createTempDirectory("graft-obs").toString
    frame.write.mode("overwrite").parquet(dir)
    val (counts, rows) = QualityChecks.observedCounts(obs, checks)
    assert(rows === 5L)
    assert(counts === QualityChecks.report(df, checks)
      .as[(String, Long)].collect().toMap)
    // and the written data is the input, untouched by the observation
    assert(spark.read.parquet(dir).count() === 5L)
  }

  test("uniqueness counts rows beyond the first per duplicated key") {
    val out = QualityChecks.report(df,
        rowChecks = Seq("k_not_null" -> $"k".isNull),
        uniqueKeys = Seq("k_unique" -> Seq("k"), "k_tag_unique" -> Seq("k", "tag")))
      .as[(String, Long)].collect().toMap
    assert(out("k_unique") === 1L)     // k=1 appears twice
    assert(out("k_tag_unique") === 1L) // (1, "a") appears twice
  }

  test("a clean frame reports zeros, including on uniqueness") {
    val clean = Seq((1L, "x"), (2L, "y")).toDF("k", "tag")
    val out = QualityChecks.report(clean,
        rowChecks = Seq("k_not_null" -> $"k".isNull),
        uniqueKeys = Seq("pk" -> Seq("k")))
      .as[(String, Long)].collect().toMap
    assert(out.values.forall(_ === 0L))
  }

  test("check names with dots and spaces survive (internal aliases positional)") {
    val out = QualityChecks.report(df, Seq(
        "v in [0, 0.1]" -> !$"v".between(0, 0.1),
        "k.not.null" -> $"k".isNull))
      .as[(String, Long)].collect().toMap
    assert(out("v in [0, 0.1]") === 5L) // 5.0, -1, null, 10, 200
    assert(out("k.not.null") === 1L)
  }

  test("uniqueness keys named like internal aliases still work") {
    val odd = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("__n0", "tag")
    val out = QualityChecks.report(odd,
        rowChecks = Seq("never" -> lit(false)),
        uniqueKeys = Seq("uq" -> Seq("__n0")))
      .as[(String, Long)].collect().toMap
    assert(out("uq") === 1L)
  }

  test("empty input reports zeros, not NULL sums") {
    val out = QualityChecks.report(df.limit(0),
        rowChecks = Seq("k_not_null" -> $"k".isNull),
        uniqueKeys = Seq("pk" -> Seq("k")))
      .as[(String, Long)].collect().toMap
    assert(out === Map("k_not_null" -> 0L, "pk" -> 0L))
  }
}
