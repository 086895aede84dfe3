package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom membership: no false negatives, bounded false positives") {
    val members = (1 to 2000).map(i => s"m-$i").toDF("v")
    val bloom = Bloom.build(members, "v", mBits = 65536)
    val probes = ((1 to 2000).map(i => s"m-$i") ++
      (1 to 2000).map(i => s"x-$i")).toDF("v")
    val out = Bloom.mightContain(probes, bloom, "v", mBits = 65536)
      .as[(String, Boolean)].collect().toMap
    // every true member MUST be reported present
    assert((1 to 2000).forall(i => out(s"m-$i")))
    // non-members: false-positive rate for k=4, m=64Ki, n=2000 is
    // (1-e^{-kn/m})^k ≈ 1e-4 — allow a generous margin
    val fps = (1 to 2000).count(i => out(s"x-$i"))
    assert(fps <= 10, s"$fps false positives")
  }

  test("bloom bit tables merge by OR") {
    val a = (1 to 1000).map(i => s"m-$i").toDF("v")
    val b = (1001 to 2000).map(i => s"m-$i").toDF("v")
    val whole = Bloom.build(a.unionByName(b), "v", mBits = 16384)
    val merged = Bloom.build(a, "v", 16384)
      .unionByName(Bloom.build(b, "v", 16384))
      .groupBy($"word_idx").agg(expr("bit_or(word)").as("word"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }
}
