package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeWeightedSpec extends SparkSpec {
  import spark.implicits._

  private def t(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)

  test("twa is the step-interpolated mean, not the row mean") {
    // value 10 held for 9s, value 100 for 1s → twa = (10·9000 + 100·1000)/10000 = 19
    val df = Seq(
      (1L, t(0), 1L, 10.0),
      (1L, t(9000), 2L, 100.0),
      (1L, t(10000), 3L, 0.0) // terminal sample closes the span
    ).toDF("user_id", "ts", "event_id", "value")
    val out = TimeWeighted.timeWeightedAvg(
      df, Seq("user_id"), "ts", "value", Seq("event_id"))
      .select($"n_samples", $"span_ms", $"twa")
      .as[(Long, Long, Double)].head()
    assert(out === ((3L, 10000L, 19.0)))
    // the row mean would say 36.7 — the sampling-rate artifact
    assert(math.abs(df.agg(avg($"value")).as[Double].head() - 36.666) < 0.01)
  }

  test("out-of-range gauge aborts loudly instead of NULL-dropping") {
    // |v|·1e6 = 2e18 exceeds DECIMAL(18,0); under non-ANSI the cast
    // would NULL and sum() would silently drop the contribution
    val df = Seq((1L, t(0), 1L, 2.0e12), (1L, t(1000), 2L, 0.0))
      .toDF("user_id", "ts", "event_id", "value")
    val ex = intercept[Exception] {
      TimeWeighted.timeWeightedAvg(
        df, Seq("user_id"), "ts", "value", Seq("event_id")).collect()
    }
    assert(ex.getMessage.contains("DECIMAL(18,0)") ||
      Option(ex.getCause).exists(_.getMessage.contains("DECIMAL(18,0)")))
  }

  test("single-sample keys yield NULL twa; duplicate timestamps pair stably") {
    val df = Seq(
      (1L, t(0), 1L, 5.0),
      (2L, t(0), 2L, 1.0), (2L, t(0), 3L, 9.0), (2L, t(1000), 4L, 0.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = TimeWeighted.timeWeightedAvg(
      df, Seq("user_id"), "ts", "value", Seq("event_id"))
      .select($"user_id", $"twa").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L).isEmpty) // empty span — not 0, not the value
    // at user 2, events 2 and 3 share ts(0); the 1s gap attaches to
    // event_id 3 (the tie-break order), so twa = 9.0
    assert(out(2L) === Some(9.0))
  }
}
