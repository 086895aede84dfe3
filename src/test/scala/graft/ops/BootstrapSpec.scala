package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("CDF breakpoints are the cumulative Poisson(1) masses, 6-dp") {
    // e^-1 * (1, 2, 2.5, ...) — hand-checked leading values
    assert(Bootstrap.cdfBreaks.take(3) ===
      Seq(0.367879, 0.735759, 0.919699))
    assert(Bootstrap.cdfBreaks.size === Bootstrap.MaxCount)
    assert(Bootstrap.cdfBreaks === Bootstrap.cdfBreaks.sorted)
    assert(Bootstrap.cdfBreaks.last > 0.99991)
  }

  test("poissonCount inverts the CDF: count = #breaks at or below u") {
    val us = Seq(0.0, 0.367878, 0.367879, 0.5, 0.92, 0.9999, 0.99999)
    val out = us.toDF("u")
      .select(Bootstrap.poissonCount(col("u")).as("c"))
      .as[Long].collect().toSeq
    assert(out === Seq(0L, 0L, 1L, 1L, 3L, 6L, 7L))
  }

  test("replicate multiplicities average ~1 and cap at MaxCount") {
    val df = (1L to 2000L).toDF("k")
    val c = df.select(Bootstrap.poissonCount(
      Sampling.coordinate(col("k"))).as("c"))
      .as[Long].collect()
    assert(c.max <= Bootstrap.MaxCount)
    val mean = c.sum.toDouble / c.length
    assert(mean > 0.9 && mean < 1.1, s"Poisson(1) mean off: $mean")
  }

  test("meanCi: deterministic across runs, CI brackets the estimate") {
    val df = (1L to 500L).map(i => (i, if (i % 3 == 0) "a" else "b",
      100L + (i * 7919) % 50)).toDF("id", "grp", "v")
    def run() = Bootstrap.meanCi(df, "id", "grp", "v")
      .as[(String, Double, Long, Double, Double)].collect().sortBy(_._1)
    val r1 = run(); val r2 = run()
    assert(r1.toSeq === r2.toSeq)
    for ((grp, mean, nBoot, lo, hi) <- r1) {
      assert(nBoot === 64L, s"$grp replicates")
      assert(lo <= hi, s"$grp bounds ordered")
      // percentile CI of the mean must bracket the point estimate
      // loosely (Poisson noise at n≥150 is a few percent)
      assert(lo <= mean && mean <= hi, s"$grp: $lo <= $mean <= $hi")
      assert(hi - lo < mean * 0.2, s"$grp: CI implausibly wide")
    }
  }

  test("meanCi matches a driver-side replay of the same contract") {
    val rows = (1L to 120L).map(i => (i, "g", 10L + i % 7))
    val df = rows.toDF("id", "grp", "v")
    val out = Bootstrap.meanCi(df, "id", "grp", "v")
      .as[(String, Double, Long, Double, Double)].collect().head
    // replay: same md5-derived coordinate, same breakpoints
    def u(key: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16).toDouble / math.pow(2, 60)
    }
    val means = (0 until 64).flatMap { b =>
      val cs = rows.map { case (id, _, v) =>
        val c = Bootstrap.cdfBreaks.count(u(s"$id:$b") >= _)
        (c.toLong * v, c.toLong)
      }
      val (sx, sc) = (cs.map(_._1).sum, cs.map(_._2).sum)
      if (sc > 0) Some(math.rint(sx.toDouble / sc * 1e6) / 1e6) else None
    }.sorted
    assert(out._3 === 64L)
    assert(out._4 === means(1)) // 2nd smallest
    assert(out._5 === means(62)) // 2nd largest (rn = cnt-1 of 64)
  }
}
