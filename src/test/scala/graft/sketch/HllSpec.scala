package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  test("HLL estimate lands within the standard error band (b=12 → ±1.6%)") {
    val n = 20000
    val df = (1 to n).map(i => ("g", s"user-$i")).toDF("grp", "v")
    val est = Hll.estimate(df, Seq("grp"), "v")
      .select($"n_est").head().getDouble(0)
    assert(math.abs(est - n) / n < 0.05, s"est $est vs exact $n")
  }

  test("duplicate-heavy input estimates distinct count, not row count") {
    val df = (1 to 50000).map(i => ("g", s"k-${i % 300}")).toDF("grp", "v")
    val out = Hll.estimate(df, Seq("grp"), "v").head()
    val est = out.getAs[Double]("n_est")
    val zeros = out.getAs[Long]("zero_regs")
    // raw HLL over-estimates small cardinalities; the linear-counting
    // correction (driver-side) brings it home
    val corrected = Hll.corrected(est, zeros)
    assert(math.abs(corrected - 300) / 300 < 0.10,
      s"corrected $corrected (raw $est, zeros $zeros)")
  }

  test("register table is mergeable state: max of parts equals whole") {
    val a = (1 to 5000).map(i => ("g", s"x-$i")).toDF("grp", "v")
    val b = (2500 to 7500).map(i => ("g", s"x-$i")).toDF("grp", "v")
    val whole = Hll.registers(a.unionByName(b), Seq("grp"), "v")
    val merged = Hll.registers(a, Seq("grp"), "v")
      .unionByName(Hll.registers(b, Seq("grp"), "v"))
      .groupBy($"grp", $"reg_idx").agg(max($"reg_rank").as("reg_rank"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }
}
