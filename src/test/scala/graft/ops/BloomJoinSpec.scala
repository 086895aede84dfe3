package graft.ops

import graft.SparkSpec
import graft.sketch.Bloom
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private val mBits = 4096

  private def big = (1L to 20000L).map(i => (i % 997L, i))
    .toDF("key", "payload")
  // selective small side: 31 distinct keys out of the fact's 997
  private def small = (0L until 997L by 32L).map(k => (k, s"dim-$k"))
    .toDF("key", "attr")

  test("pruned join result is bit-identical to the plain join") {
    val plain = big.join(small, Seq("key"))
    val pruned = BloomJoin.prunedJoin(big, small, "key", mBits)
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("bloom has no false negatives and the pruning actually bites") {
    val words = BloomJoin.bloomWords(small, "key", mBits)
    val flagged = big.filter(
      Bloom.mightContainWords(col("key"), words, mBits))
    // every truly-matching fact row survives the filter
    val matching = big.join(small.select($"key"), Seq("key"), "left_semi")
    assert(matching.exceptAll(flagged.select($"key", $"payload")).isEmpty)
    // and the filter removes a large share of the non-matching rows
    val total = big.count()
    val kept = flagged.count()
    val trueMatches = matching.count()
    assert(kept < total / 2, s"filter kept $kept of $total — no pruning")
    assert(kept >= trueMatches)
  }

  test("membership probe is a pure projection: no exchange above the scan") {
    val words = BloomJoin.bloomWords(small, "key", mBits)
    val plan = big.filter(Bloom.mightContainWords(col("key"), words, mBits))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe added an exchange:\n$plan")
    // the literal word array constant-folds: no CreateArray left at runtime
    val optimized = big.filter(Bloom.mightContainWords(col("key"), words, mBits))
      .queryExecution.optimizedPlan.toString
    assert(!optimized.contains("array("), s"words array not folded:\n$optimized")
  }

  test("literal-words probe agrees with the join-form membership API") {
    val words = BloomJoin.bloomWords(small, "key", mBits)
    val viaWords = big.select($"key",
        Bloom.mightContainWords(col("key"), words, mBits).as("m"))
      .distinct().as[(Long, Boolean)].collect().toMap
    val bloomTable = Bloom.build(small.select($"key"), "key", mBits)
    val viaJoin = Bloom.mightContain(
        big.select($"key").distinct(), bloomTable, "key", mBits)
      .as[(Long, Boolean)].collect().toMap
    assert(viaWords === viaJoin)
  }

  test("dense word array layout matches the sparse build table") {
    val words = BloomJoin.bloomWords(small, "key", mBits)
    val sparse = Bloom.build(small.select($"key"), "key", mBits)
      .as[(Long, Long)].collect().toMap
    assert(words.length === (mBits - 1) / 63 + 1)
    words.zipWithIndex.foreach { case (w, i) =>
      assert(w === sparse.getOrElse(i.toLong, 0L))
    }
  }
}
