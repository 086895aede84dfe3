package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("EWMA matches the hand-computed recurrence, seeded by the first value") {
    val ev = Seq(
      (1L, ts(10), 1L, 8.0),
      (1L, ts(20), 2L, 4.0),
      (1L, ts(30), 3L, 16.0),
      (2L, ts(10), 4L, 5.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = TimeSeries.ewma(ev, "user_id", "ts", "event_id", "value", 0.25)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // user 1: y0=8; y1=0.25·4+0.75·8=7; y2=0.25·16+0.75·7=9.25
    assert(out(1L) === ((3L, 9.25)))
    // single event: ewma = the value itself
    assert(out(2L) === ((1L, 5.0)))
  }

  test("timestamp ties fold in event_id order — the total-order guarantee") {
    val ev = Seq(
      (1L, ts(10), 1L, 0.0),
      (1L, ts(20), 3L, 100.0), // same ts as event 2, higher id → later
      (1L, ts(20), 2L, 0.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.ewma(ev, "user_id", "ts", "event_id", "value", 0.25)
      .collect().head.getDouble(2)
    // order (0, 0, 100): y = 0.25·100 = 25.0; the wrong order
    // (0, 100, 0) would give 18.75
    assert(got === 25.0)
  }

  test("alpha outside the exact-quarters class is rejected loudly") {
    val ev = Seq((1L, ts(1), 1L, 1.0)).toDF("user_id", "ts", "event_id", "value")
    intercept[IllegalArgumentException] {
      TimeSeries.ewma(ev, "user_id", "ts", "event_id", "value", 0.3)
    }
  }
}
