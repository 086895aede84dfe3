package graft.ops

import graft.sketch.Bloom
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime bloom-pruned join — the explicit form of the runtime-filter
  * optimization: build a Bloom filter over the SMALL side's join keys
  * (one bounded aggregate, ≤ mBits/63 + 1 words of driver state),
  * inline it as a literal membership predicate on the BIG side, and
  * only then run the exact join.
  *
  * Why it matters at 100 TB: a shuffle join moves EVERY fact row
  * through the exchange, matched or not. When the dim side is
  * selective (a filtered dimension, an incremental-batch key set),
  * most fact rows can be proven non-matching for the cost of a hash
  * and two constant-array lookups — BEFORE they are serialized into
  * shuffle blocks. The filter is one-sided (false positives possible,
  * false negatives never), so the exact join downstream removes the
  * survivors that don't match: the RESULT is bit-identical to the
  * plain join, which is exactly what the oracle checks
  * (`q_bloom_join` replays the plain join, no bloom arithmetic).
  *
  * Scale shape: the bloom build aggregates the small side map-side
  * (bit_or partials) into ≤ mBits/63 + 1 rows; the collected dense
  * word array is bounded MODEL state (mBits ≤ 2^20 → ≤ 128 KiB), the
  * same contract as k-means centroids or PQ codebooks. The probe is a
  * narrow codegen projection — no extra exchange appears in the plan
  * (verified by BloomJoinSpec), and the join's own exchange sees only
  * the pre-filtered survivors. Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` applies the same idea
  * automatically when statistics allow; this operator makes the
  * decision explicit and engine-portable.
  */
object BloomJoin {

  /** Dense bloom word array of `small`'s `keyCol` values: word i holds
    * probe bits [63·i, 63·i+63) (bit 63 unused — [[Bloom]] layout).
    */
  def bloomWords(small: DataFrame, keyCol: String, mBits: Int): Array[Long] = {
    val words = new Array[Long]((mBits - 1) / 63 + 1)
    // bounded collect: ≤ words.length rows of (word_idx, word)
    Bloom.build(small.select(col(keyCol)), keyCol, mBits).collect()
      .foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words
  }

  /** Inner join of `big` ⋈ `small` on the shared `key` column, with
    * the big side pre-pruned by a bloom of the small side's keys.
    * Result is exactly `big.join(small, Seq(key))` — the bloom only
    * moves work off the exchange.
    */
  def prunedJoin(big: DataFrame, small: DataFrame, key: String,
      mBits: Int): DataFrame = {
    val words = bloomWords(small, key, mBits)
    big.filter(Bloom.mightContainWords(col(key), words, mBits))
      .join(small, Seq(key))
  }
}
