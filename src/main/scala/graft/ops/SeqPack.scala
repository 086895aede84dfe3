package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing — the last hop of a pretraining data pipeline:
  * the curated corpus is (deterministically) shuffled, its token
  * stream conceptually concatenated, and cut into fixed-length
  * training sequences of `seqLen` tokens; documents freely straddle
  * sequence boundaries (GPT-style packing). The quantity the pipeline
  * needs per document is its EXCLUSIVE prefix offset in the stream —
  * from it, the first/last sequence ids and the boundary-crossing
  * flag are pure arithmetic, and downstream shard writers can cut the
  * stream without ever materializing it.
  *
  * The scale problem is the global prefix sum. The textbook
  * `sum() OVER (ORDER BY …)` is the one-reducer WindowExec cliff, so
  * [[prefixSumByOrder]] reuses [[graft.dedup.SortedNeighborhood]]'s
  * range-shard discipline: range-repartition on the order key,
  * per-shard windowed cumsum, and a BOUNDED collect of numShards
  * per-shard totals prefix-summed into shard offsets. Two full-data
  * shuffles, shard-sized sorts, zero single-partition stages; the
  * result depends only on the total order, never on shard placement.
  */
object SeqPack {

  /** Exclusive global prefix sum of `valueCol` (long-castable) under
    * the total order of `orderCols` (MUST end in a unique tiebreaker).
    * Output: input columns + `prefix` (long; 0 for the first row).
    */
  def prefixSumByOrder(df: DataFrame, valueCol: String,
      orderCols: Seq[String], numShards: Int): DataFrame = {
    require(numShards >= 1, "need numShards >= 1")
    require(orderCols.nonEmpty, "need at least one order column")
    Seq("prefix", "__pid", "__v").foreach(c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column — rename it first"))
    val cols = orderCols.map(col)
    // a NULL value must fail LOUDLY: sum() would skip it silently, so
    // the row would occupy an output slot while contributing 0 to
    // every later offset — downstream sequence cuts land wrong with
    // no error (and an all-NULL shard would NPE the driver collect)
    val v = when(col(valueCol).isNotNull, col(valueCol).cast(LongType))
      .otherwise(raise_error(concat(
        lit(s"SeqPack: NULL $valueCol under order key "),
        concat_ws(",", cols: _*))).cast(LongType))
    val parted = graft.CacheRegistry.register(
      df.repartitionByRange(numShards, cols: _*)
        .withColumn("__pid", spark_partition_id())
        .withColumn("__v", v)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // bounded: ≤ numShards rows
    val totals = parted.groupBy(col("__pid"))
      .agg(sum(col("__v")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = new Array[Long](numShards)
    var acc = 0L
    (0 until numShards).foreach { p =>
      offsets(p) = acc; acc += totals.getOrElse(p, 0L)
    }
    val w = Window.partitionBy(col("__pid")).orderBy(cols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted
      .withColumn("prefix",
        element_at(lit(offsets), col("__pid") + 1) +
          coalesce(sum(col("__v")).over(w), lit(0L)))
      .drop("__pid", "__v")
  }

  /** Pack plan for the corpus: per document, its exclusive token
    * offset in the (orderCols-ordered) stream and the sequence-id
    * arithmetic against `seqLen`-token training sequences. Output:
    * (idCol, n_toks, prefix, seq_first, seq_last, n_seqs, crosses)
    * — empty documents occupy zero sequences (n_seqs = 0).
    */
  def pack(df: DataFrame, idCol: String, nToks: Column,
      orderKey: Column, seqLen: Int, numShards: Int = 32): DataFrame = {
    require(seqLen >= 1, "need seqLen >= 1")
    val staged = df.select(col(idCol).cast(LongType).as("id"),
      nToks.cast(LongType).as("n_toks"), orderKey.as("__k"))
    val p = prefixSumByOrder(staged, "n_toks", Seq("__k", "id"), numShards)
    // `div`, not `/`: Column./ is Divide (double) even on longs; div
    // stays exact integral for any offset magnitude
    val first = expr(s"prefix div $seqLen")
    val last = expr(s"(prefix + n_toks - 1) div $seqLen")
    p.select(col("id").as(idCol), col("n_toks"), col("prefix"),
        first.as("seq_first"),
        when(col("n_toks") > 0L, last).otherwise(first).as("seq_last"),
        when(col("n_toks") > 0L, last - first + 1L).otherwise(0L)
          .as("n_seqs"))
      .withColumn("crosses",
        when(col("n_seqs") > 1L, 1).otherwise(0))
  }
}
