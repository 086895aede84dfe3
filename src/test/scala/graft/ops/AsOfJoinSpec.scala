package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("matched right row with NULL payload wins over an older non-null row") {
    val left = Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "ts")
    val right = Seq(("a", 5L, Option(1.0)), ("a", 15L, Option.empty[Double]))
      .toDF("k", "rts", "pv")
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", "rts", Seq("pv"))
      .select($"k", $"ts", $"asof_pv").as[(String, Long, Option[Double])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("a", 10L)) === Some(1.0))
    // the ts=15 right row matches at ts=20 and carries a genuine NULL —
    // ROW presence drives the match (DuckDB ASOF attaches the matched
    // row's NULL); per-column last(ignoreNulls) would fall back to 1.0
    assert(out(("a", 20L)) === None)
    assert(out(("b", 5L)) === None) // no right row at all
  }

  test("multi-column payload rides as one row (values stay aligned)") {
    val left = Seq(("a", 10L), ("a", 30L)).toDF("k", "ts")
    val right = Seq(("a", 5L, 1.0, "x"), ("a", 25L, 2.0, "y"))
      .toDF("k", "rts", "pv", "tag")
    val out = AsOfJoin.asof(left, right, Seq("k"), "ts", "rts", Seq("pv", "tag"))
      .select($"ts", $"asof_pv", $"asof_tag").as[(Long, Double, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(10L) === ((1.0, "x")))
    assert(out(30L) === ((2.0, "y")))
  }

  test("payload names colliding with left columns are rejected") {
    val left = Seq(("a", 10L, 1.0)).toDF("k", "ts", "pv")
    val right = Seq(("a", 5L, 2.0)).toDF("k", "rts", "pv")
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(left, right, Seq("k"), "ts", "rts", Seq("pv"))
    }
  }
}
