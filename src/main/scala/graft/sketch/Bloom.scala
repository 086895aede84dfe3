package graft.sketch

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bloom filter as a relational sketch — the join-pruning tool at
  * scale: build a small bit table from the dim side's keys, broadcast
  * it, and prune the fact scan to rows that MIGHT match before paying
  * the real join's shuffle (one-sided error: false positives possible,
  * false negatives never).
  *
  * The filter is a (word_idx, word) table of 64-bit words aggregated
  * with bit_or — order-independent and mergeable by OR — and probes
  * use the same portable md5-derived hash as every other sketch, so
  * membership results are deterministic cross-engine and sit under the
  * exact hash-match gate (q_bloom_filter).
  */
object Bloom {

  val P: Long = 2147483647L
  /** probe-hash coefficients pos_i(x) = ((x·a_i + b_i) mod P) mod m */
  val probeCoeffs: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (22695477L, 1L), (69069L, 362437L), (48271L, 11L))

  private def itemHash(c: Column): Column =
    TextAnalysis.hash60(c.cast(StringType)) % P

  private def probes(c: Column, mBits: Int): Seq[Column] = {
    val x = itemHash(c)
    probeCoeffs.map { case (a, b) => (x * a + b) % P % mBits }
  }

  /** 1L << n with a COLUMN shift (functions.shiftleft only takes a
    * literal) — the catalyst ShiftLeft accepts two expressions.
    */
  private def shl1(n: Column): Column =
    Bridge.toColumn(org.apache.spark.sql.catalyst.expressions.ShiftLeft(
      Bridge.toExpression(lit(1L)), Bridge.toExpression(n.cast(IntegerType))))

  /** 63 bits per word — bit 63 stays unused because `1::BIGINT << 63`
    * overflows DuckDB's range-checked signed shift (Spark would wrap
    * silently; the layouts must agree). p < mBits ≤ 2^20, so the
    * double-typed division is exact before the truncating cast.
    */
  private def cellStructs(value: Column, mBits: Int): Column =
    array(probes(value, mBits).map(p =>
      struct((p / 63).cast(LongType).as("word_idx"),
        shl1(p % 63).as("mask"))): _*)

  /** Build the bit table: (word_idx, word) rows, ≤ mBits/64 of them. */
  def build(df: DataFrame, valueCol: String, mBits: Int): DataFrame =
    df.select(explode(cellStructs(col(valueCol), mBits)).as("c"))
      .select(col("c.word_idx"), col("c.mask"))
      .groupBy(col("word_idx"))
      .agg(expr("bit_or(mask)").as("word"))

  /** Probe: for each row of `items`, `might_contain` = all k probe bits
    * set in the filter. The filter table is tiny → broadcast join.
    */
  def mightContain(items: DataFrame, bloom: DataFrame, valueCol: String,
      mBits: Int): DataFrame =
    items
      .select(col(valueCol), explode(cellStructs(col(valueCol), mBits)).as("c"))
      .select(col(valueCol), col("c.word_idx"), col("c.mask"))
      .join(broadcast(bloom), Seq("word_idx"), "left")
      .groupBy(col(valueCol))
      .agg(expr("bool_and((coalesce(word, CAST(0 AS BIGINT)) & mask) != 0)")
        .as("might_contain"))

  /** Membership as a PURE PROJECTION against a dense word array
    * (word i holds bits [63·i, 63·i+63)): all k probe bits set.
    * Implemented as the native
    * [[graft.functions.BloomContainsExpr]] — the words ride along as
    * a codegen reference object (one compact plan node, ~8k longs for
    * mBits = 2^19), one md5 per row, zero joins, zero shuffle. This is
    * the runtime-filter shape [[graft.ops.BloomJoin]] uses to prune a
    * fact scan BEFORE the join's exchange; the dense form caps mBits
    * at [[build]]'s 2^20 contract (≤ ~16k words). The expression
    * receives [[probeCoeffs]]/[[P]] from here, so the probe arithmetic
    * is shared with [[build]]/[[oracleSql]] by construction.
    */
  def mightContainWords(value: Column, words: Array[Long], mBits: Int): Column =
    Bridge.toColumn(graft.functions.BloomContainsExpr(
      Bridge.toExpression(value.cast(StringType)), words, mBits,
      probeCoeffs.map(_._1), probeCoeffs.map(_._2), P))

  /** DuckDB mirror: membership flags for every `probeExpr` of
    * `probeTable` against a bloom of `buildExpr` from `buildTable`.
    */
  def oracleSql(buildTable: String, buildExpr: String,
      probeTable: String, probeExpr: String, mBits: Int): String = {
    def h(e: String) =
      s"cast(('0x' || substr(md5(cast($e as varchar)), 1, 15)) as bigint) % $P"
    def cells(src: String, e: String, keep: String) =
      probeCoeffs.map { case (a, b) =>
        val pos = s"(((${h(e)} * $a + $b) % $P) % $mBits)"
        s"""SELECT $keep, $pos // 63 AS word_idx,
           |  1::BIGINT << cast($pos % 63 as int) AS mask
           |FROM $src""".stripMargin
      }.mkString("\nUNION ALL\n")
    s"""WITH bcells AS (
       |${cells(buildTable, buildExpr, "1 AS one")}),
       |bloom AS (
       |  SELECT word_idx, bit_or(mask) AS word FROM bcells GROUP BY 1),
       |pcells AS (
       |${cells(probeTable, probeExpr, s"$probeExpr AS key")}),
       |probed AS (
       |  SELECT p.key, bool_and((coalesce(b.word, 0::BIGINT) & p.mask) != 0)
       |    AS might_contain
       |  FROM pcells p LEFT JOIN bloom b USING (word_idx)
       |  GROUP BY 1)
       |SELECT key, might_contain FROM probed""".stripMargin
  }
}
