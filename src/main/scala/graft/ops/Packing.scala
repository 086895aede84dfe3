package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing — the concat-and-chunk step that turns a document
  * corpus into fixed-token-budget training sequences: documents are
  * concatenated in a deterministic order and chunked every `budget`
  * tokens, so a document may span several packs and a pack several
  * documents. The output maps each document to its token span and the
  * pack range it lands in, which is all a downstream tokenizer-writer
  * needs to materialize the packed sequences.
  *
  * Scale shape: packing is SHARD-LOCAL (window partitioned by
  * `shardCol`) — a global ordering would serialize into a single
  * reducer, and real pipelines pack per shard/source anyway. One
  * sort-shuffle on the shard key; everything else is arithmetic on the
  * running sum. Deterministic when the within-shard sort key
  * (`orderCol` plus any `tieCols`) is unique — re-runs and other
  * engines then agree exactly; see the `orderCol`/`tieCols` notes.
  *
  * Shard granularity is the parallelism knob: a shard is one window
  * partition, so a SKEWED shard (one source holding most of a 100 TB
  * corpus) serializes its own packing. Pre-split giant sources into a
  * composite shard key (e.g. `concat(source, '_', pmod(hash(id), k))`)
  * — packs then restart per sub-shard, which is exactly the shard
  * boundary a downstream writer wants anyway.
  */
object Packing {

  /** @param df       corpus rows
    * @param shardCol  packing shard (source, split, …) — packs never
    *                  cross a shard boundary
    * @param orderCol  deterministic order within the shard. The ROWS-
    *                  frame prefix sum is only deterministic when
    *                  (orderCol ++ tieCols) is UNIQUE within a shard;
    *                  with duplicate sort keys the span assignment
    *                  depends on physical row order and differs across
    *                  runs/engines
    * @param tokCol    per-document token count column
    * @param budget    tokens per pack
    * @param tieCols   extra orderBy columns breaking orderCol ties
    *                  (e.g. the document id) — pass these whenever
    *                  orderCol alone is not unique
    * @return df + (start_tok, end_tok, pack_first, pack_last) where
    *         [start_tok, end_tok) is the document's token span in the
    *         shard's concatenation and pack_first/last the chunk range
    *         it overlaps (an empty document occupies zero tokens and
    *         reports its insertion point's pack twice)
    */
  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
      tokCol: String, budget: Int, tieCols: Seq[String] = Nil): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol))
      .orderBy((orderCol +: tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_tok",
        coalesce(sum(col(tokCol)).over(w), lit(0L)).cast(LongType))
      .withColumn("end_tok", col("start_tok") + col(tokCol))
      .withColumn("pack_first", floor(col("start_tok") / budget).cast(LongType))
      .withColumn("pack_last",
        floor(greatest(col("end_tok") - 1, col("start_tok")) / budget)
          .cast(LongType))
  }
}
