package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate: exact below k, within the error band above k") {
    val small = (1 to 100).map(i => ("g", s"v-$i")).toDF("grp", "v")
    val exactRow = Kmv.estimateDistinct(small, Seq("grp"), "v", k = 512).head()
    assert(exactRow.getAs[Long]("n_regs") === 100L)
    assert(exactRow.getAs[Double]("n_est") === 100.0) // sketch holds all

    val big = (1 to 20000).map(i => ("g", s"v-$i")).toDF("grp", "v")
    val est = Kmv.estimateDistinct(big, Seq("grp"), "v", k = 512)
      .head().getAs[Double]("n_est")
    // standard error ≈ 1/√k ≈ 4.4% at k=512; allow 3σ
    assert(math.abs(est - 20000) / 20000 < 0.14, s"est $est")
  }

  test("bounded k-min aggregate equals the brute-force distinct+sort form") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.StringType
    val df = (1 to 5000).map(i => (s"g${i % 3}", s"v-${i % 1200}")).toDF("grp", "v")
    val regs = Kmv.registers(df, Seq("grp"), "v", k = 64)
    val w = Window.partitionBy($"grp").orderBy($"h".asc)
    val brute = df.select($"grp",
        graft.text.TextAnalysis.hash60($"v".cast(StringType)).as("h"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 64)
    assert(regs.exceptAll(brute).isEmpty && brute.exceptAll(regs).isEmpty)
  }

  test("null values are not registers (skipped, not a null row)") {
    val df = (Seq.tabulate(20)(i => ("g", Option(s"v-$i"))) ++
      Seq(("g", Option.empty[String]))).toDF("grp", "v")
    val regs = Kmv.registers(df, Seq("grp"), "v", k = 64).collect()
    assert(regs.length === 20)
    assert(regs.forall(!_.isNullAt(1)))
    val est = Kmv.estimateDistinct(df, Seq("grp"), "v", k = 64).head()
    assert(est.getAs[Long]("n_regs") === 20L)
  }

  test("KMV jaccard estimate tracks a planted 50% overlap") {
    val a = (1 to 8000).map(i => s"x-$i").toDF("v")
    val b = (4001 to 12000).map(i => s"x-$i").toDF("v")
    val out = Kmv.jaccardEstimate(a, b, "v", k = 1024).head()
    val jac = out.getAs[Double]("est_jaccard")       // true J = 4000/12000 = 1/3
    val inter = out.getAs[Double]("est_intersection") // true = 4000
    assert(math.abs(jac - 1.0 / 3) < 0.07, s"jaccard $jac")
    assert(math.abs(inter - 4000) / 4000 < 0.2, s"intersection $inter")
  }

  test("trim-after-merge: merged fine sketches equal the direct coarse sketch") {
    // disjoint fine groups so merging must combine register sets and
    // the re-trim actually cuts (each fine sketch is k-full)
    val k = 64
    val df = ((1 to 500).map(i => ("x", "a", s"v-$i")) ++
      (501 to 1200).map(i => ("x", "b", s"v-$i"))).toDF("c", "f", "v")
    val merged = Kmv.registers(df, Seq("c", "f"), "v", k)
      .groupBy($"c")
      .agg(graft.functions.KMinAgg.k_min_distinct($"h", k).as("hs"))
      .select(org.apache.spark.sql.functions.element_at($"hs", -1).as("kth"),
        org.apache.spark.sql.functions.size($"hs").as("n"))
      .head()
    val direct = Kmv.registers(df, Seq("c"), "v", k)
      .groupBy($"c")
      .agg(graft.functions.KMinAgg.k_min_distinct($"h", k).as("hs"))
      .select(org.apache.spark.sql.functions.element_at($"hs", -1).as("kth"),
        org.apache.spark.sql.functions.size($"hs").as("n"))
      .head()
    assert(merged === direct)
  }
}
