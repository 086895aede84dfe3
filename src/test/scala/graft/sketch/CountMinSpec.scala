package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def stream = (1 to 5000).map { i =>
    // zipfish: token t1 dominates, long tail of rare tokens
    val tok = if (i % 2 == 0) "t1" else if (i % 3 == 0) "t2" else s"rare-$i"
    ("g", tok)
  }.toDF("grp", "v")

  test("CMS never underestimates, and is near-exact for heavy hitters") {
    val exact = stream.groupBy($"v").agg(count(lit(1)).as("n"))
    val est = CountMin.estimate(stream, exact.select($"v"), Seq.empty, "v", w = 1024)
    val joined = est.join(exact, Seq("v"))
      .select($"v", $"est_count", $"n").as[(String, Long, Long)].collect()
    assert(joined.forall { case (_, e, n) => e >= n })  // one-sided error
    val t1 = joined.find(_._1 == "t1").get
    // heavy hitter collides with at most a sliver of the tail mass
    assert(t1._2 - t1._3 <= 50, s"t1 est ${t1._2} vs exact ${t1._3}")
  }

  test("grouped estimates look up each group's own counters") {
    val rows = (1 to 900).map(_ => ("g1", "t1")) ++
      (1 to 10).map(_ => ("g2", "t1")) ++
      (1 to 300).map(i => ("g2", s"tail-$i"))
    val df = rows.toDF("grp", "v")
    val est = CountMin.estimate(df, Seq("t1").toDF("v"), Seq("grp"), "v", w = 1024)
      .select($"grp", $"est_count").as[(String, Long)].collect().toMap
    // per-group one-sided error: the old group-agnostic counter join
    // took the min across BOTH groups' rows, estimating t1-in-g1 at ~10
    assert(est("g1") >= 900L)
    assert(est("g2") >= 10L && est("g2") < 100L)
  }

  test("counter tables merge by addition") {
    val a = stream.filter($"v" =!= "t2")
    val b = stream.filter($"v" === "t2")
    val whole = CountMin.counters(stream, Seq.empty, "v", w = 256)
    val merged = CountMin.counters(a, Seq.empty, "v", w = 256)
      .unionByName(CountMin.counters(b, Seq.empty, "v", w = 256))
      .groupBy($"cm_row", $"cm_bucket").agg(sum($"cnt").as("cnt"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }
}
