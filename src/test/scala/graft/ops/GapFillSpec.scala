package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
  private def obs(rows: (String, Int, Double)*) =
    rows.toSeq.map { case (k, h, v) => (k, ts(h), v) }.toDF("k", "t", "v")

  private def fill(df: org.apache.spark.sql.DataFrame) =
    GapFill.fill(df, Seq("k"), date_trunc("hour", $"t"), "interval 1 hour",
      Seq("v_sum" -> sum($"v")))

  test("missing buckets appear with n_obs=0 and forward-filled value") {
    val out = fill(obs(("a", 1, 1.0), ("a", 4, 4.0)))
      .orderBy($"bucket")
      .select($"n_obs", $"v_sum", $"v_sum_fill")
      .as[(Long, Option[Double], Option[Double])].collect().toList
    assert(out === List(
      (1L, Some(1.0), Some(1.0)),
      (0L, None, Some(1.0)),      // hour 2: carried forward
      (0L, None, Some(1.0)),      // hour 3: still carried
      (1L, Some(4.0), Some(4.0))))
  }

  test("grid is per key: spans do not leak across keys") {
    val out = fill(obs(("a", 1, 1.0), ("a", 3, 3.0), ("b", 10, 9.0)))
    assert(out.count() === 4) // a: hours 1-3 (3 rows), b: hour 10 only
    assert(out.filter($"k" === "b").count() === 1)
  }

  test("multiple observations in one bucket aggregate before filling") {
    val out = fill(obs(("a", 1, 1.0), ("a", 1, 2.0)))
      .select($"n_obs", $"v_sum").as[(Long, Double)].collect().toList
    assert(out === List((2L, 3.0)))
  }

  test("dotted aggregate names resolve (getField, not dotted-path col)") {
    val out = GapFill.fill(obs(("a", 1, 2.0), ("a", 3, 4.0)), Seq("k"),
      date_trunc("hour", $"t"), "interval 1 hour",
      Seq("p50.v" -> sum($"v")))
    assert(out.columns.contains("p50.v") && out.columns.contains("p50.v_fill"))
    assert(out.count() === 3)
  }

  test("reserved generated names are rejected up front") {
    intercept[IllegalArgumentException] {
      GapFill.fill(obs(("a", 1, 2.0)), Seq("k"), date_trunc("hour", $"t"),
        "interval 1 hour", Seq("n_obs" -> sum($"v")))
    }
  }

  test("fill restarts per key and never reads a future value") {
    val out = fill(obs(("a", 1, 5.0), ("b", 1, 7.0), ("b", 3, 8.0)))
      .filter($"k" === "b").orderBy($"bucket")
      .select($"v_sum_fill").as[Double].collect().toList
    assert(out === List(7.0, 7.0, 8.0))
  }
}
