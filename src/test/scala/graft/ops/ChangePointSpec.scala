package graft.ops

import graft.SparkSpec
import java.sql.Date
import org.apache.spark.sql.functions._

class ChangePointSpec extends SparkSpec {
  import spark.implicits._

  private def day(i: Int): Date = Date.valueOf(f"2024-01-${i + 1}%02d")

  private def run(series: Seq[Long]*): Map[String, (Long, Double, Double,
      Double, Option[String], Long)] = {
    val rows = series.zipWithIndex.flatMap { case (ms, k) =>
      ms.zipWithIndex.map { case (m, i) => (s"k$k", day(i), m) }
    }
    ChangePoint.cusum(rows.toDF("key", "day", "m"), "key")
      .as[(String, Long, Double, Double, Double, Option[String], Long)]
      .collect()
      .map { case (k, n, mu, sg, mx, al, na) => k -> ((n, mu, sg, mx, al, na)) }
      .toMap
  }

  test("constant series: sigma 0, statistic stays 0, no alarm") {
    val out = run(Seq.fill(10)(500L))
    assert(out("k0") === ((10L, 500.0, 0.0, 0.0, None, 0L)))
  }

  test("level shift alarms, and on the right day") {
    // 20 days at 1000, 10 days at 2000: a 1000-milli shift vs the
    // window sigma — replay the recursion driver-side for the oracle
    val ms = Seq.fill(20)(1000L) ++ Seq.fill(10)(2000L)
    val n = ms.size.toDouble
    val mu = ms.sum.toDouble / n
    val sigma = math.sqrt(math.max(0.0,
      ms.map(m => m.toDouble * m).sum / n - mu * mu))
    var s = 0.0; var maxS = 0.0; var alarm = -1; var nA = 0L
    ms.zipWithIndex.foreach { case (m, i) =>
      s = math.max(0.0, s + ((m.toDouble - mu) - sigma * 0.5))
      maxS = math.max(maxS, s)
      if (s > sigma * 4.0) { if (alarm < 0) alarm = i; nA += 1 }
    }
    val out = run(ms)("k0")
    assert(out._1 === 30L)
    assert(out._2 === math.rint(mu * 1e6) / 1e6)
    assert(out._3 === math.rint(sigma * 1e6) / 1e6)
    assert(out._4 === math.rint(maxS * 1e6) / 1e6)
    assert(alarm >= 20, "alarm must land inside the shifted regime")
    assert(out._5 === Some(day(alarm).toString))
    assert(out._6 === nA)
  }

  test("upper chart fires inside whichever regime sits ABOVE the " +
      "window mean — high-first series alarms early, not at the drop") {
    // 20 days at 2000 then 10 at 1000: devs vs the window mean are
    // +333 for the FIRST regime, so the upper chart accumulates there
    val out = run(Seq.fill(20)(2000L) ++ Seq.fill(10)(1000L))("k0")
    assert(out._5.isDefined && out._5.get < day(20).toString,
      s"alarm ${out._5} must land in the elevated first regime")
  }

  test("bounded oscillation never reaches the 4-sigma line") {
    // ±10 around 1000: sigma = 10, each up-step adds 5, each down
    // resets — S_max = 5 << h = 40
    val ms = (0 until 30).map(i => if (i % 2 == 0) 1010L else 990L)
    val out = run(ms)("k0")
    assert(out._5 === None)
    assert(out._6 === 0L)
    assert(out._4 <= 5.0)
  }

  test("keys fold independently") {
    // balanced 10+10 split: sigma = dev, 10 deviating days x dev/2
    // = 5 sigma > h = 4 sigma -> alarms; the constant key never does
    val out = run(Seq.fill(10)(100L),
      Seq.fill(10)(100L) ++ Seq.fill(10)(900L))
    assert(out("k0")._6 === 0L)
    assert(out("k1")._6 > 0L)
    assert(out("k0")._1 === 10L && out("k1")._1 === 20L)
  }

  test("dailyMilliMean quantizes and averages per (key, day)") {
    val ev = Seq(
      ("a", "2024-01-01 01:00:00", 1.2342),
      ("a", "2024-01-01 05:00:00", 2.0),
      ("a", "2024-01-02 01:00:00", 3.0)
    ).toDF("k", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val out = ChangePoint.dailyMilliMean(ev, "k", "ts", "v")
      .orderBy("day").as[(String, Date, Long)].collect()
    // day 1: round((1234 + 2000) / 2) = 1617; day 2: 3000
    assert(out.map(_._3).toSeq === Seq(1617L, 3000L))
  }
}
