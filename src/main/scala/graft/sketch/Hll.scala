package graft.sketch

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic, engine-portable HyperLogLog distinct-count sketch.
  *
  * Classic HLL is approximate AND hash-dependent — two engines never
  * agree on the estimate, so approximate distinct normally gets only a
  * tolerance check. This formulation makes the whole sketch
  * REPRODUCIBLE BIT-FOR-BIT across engines (the DuckDB oracle
  * hash-matches it):
  *
  *  - the item hash is the portable md5-derived [[TextAnalysis.hash60]]
  *    (same value in any engine that can md5 a string);
  *  - the register rank uses `length(bin(w))` — an exact, string-based
  *    floor(log2)+1, immune to float log rounding;
  *  - the harmonic sum Σ 2^(−M_j) is computed as the exact integer
  *    Σ 2^(RANK_MAX − M_j) via shifts, aggregated in DECIMAL(38,0)
  *    (order-independent), with absent registers folded in as
  *    (m − k)·2^RANK_MAX;
  *  - the only floating-point step is one final constant/Σ division.
  *
  * Accuracy is standard HLL: relative error ≈ 1.04/√m (±1.6 % at
  * b=12). Scale shape: one hash-aggregate to (group, register) — at
  * most m rows per group survive the map-side combine — then a tiny
  * per-group aggregate; no distinct-shuffle of the raw values, which
  * is the entire point at 100 TB.
  *
  * (The classic small-range linear-counting correction uses ln(), whose
  * last-bit behavior differs across libm implementations; [[estimate]]
  * returns the raw HLL estimate plus the zero-register count so callers
  * — and the oracle — stay deterministic, and [[corrected]] applies the
  * standard correction driver-side where cross-engine determinism is
  * not required.)
  */
object Hll {

  val defaultB = 12

  private[sketch] def alphaM2Scaled(b: Int): Double = {
    val m = 1 << b
    val alpha = b match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    // α·m² · 2^RANK_MAX — the numerator constant of the estimate once
    // the harmonic sum is integer-scaled by 2^RANK_MAX
    alpha * m.toDouble * m.toDouble * math.pow(2.0, rankMax(b))
  }

  /** width of the rank-bearing hash remainder; rank ∈ [1, width+1] */
  private[sketch] def width(b: Int): Int = 60 - b
  private[sketch] def rankMax(b: Int): Int = width(b) + 1

  /** Per-(group, register) max-rank table: the mergeable sketch state. */
  def registers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      b: Int = defaultB): DataFrame = {
    val m = 1 << b
    val h = TextAnalysis.hash60(col(valueCol).cast(StringType))
    // register split via shift/mask, NOT `/` and `%`: Column./ is
    // DOUBLE division and h exceeds 2^53, so the low bits would be
    // lost. h is positive, m a power of two → h >> b and h & (m-1)
    // are the exact quotient/remainder (and match DuckDB's // and %).
    val w = shiftright(h, b)
    // exact floor(log2(w))+1 via the binary-string length; w = 0 (all
    // remainder bits zero) gets the maximal rank width+1
    val rank = when(w === 0, lit(rankMax(b)))
      .otherwise(lit(width(b) + 1) - length(bin(w)))
    df.select((groupCols.map(col) :+
      h.bitwiseAND(lit((m - 1).toLong)).as("reg_idx") :+ rank.as("rank")): _*)
      .groupBy((groupCols.map(col) :+ col("reg_idx")): _*)
      .agg(max(col("rank")).as("reg_rank"))
  }

  /** Raw HLL estimate per group: `n_est` (one exact double division)
    * plus `zero_regs` (for the optional small-range correction) and
    * the exact integer-scaled harmonic sum `harmonic_scaled`.
    */
  def estimate(df: DataFrame, groupCols: Seq[String], valueCol: String,
      b: Int = defaultB): DataFrame =
    estimateFromRegisters(registers(df, groupCols, valueCol, b), groupCols, b)

  /** Finalize estimates from a (group, reg_idx, reg_rank) register
    * table — the merge/read-back path for sketches persisted by a
    * stream ([[graft.streaming.EventStreams.hllRegistersStream]]) or
    * unioned across partitions/days (re-aggregate with max first when
    * merging). Arithmetic identical to [[estimate]]'s tail.
    */
  def estimateFromRegisters(regs: DataFrame, groupCols: Seq[String],
      b: Int = defaultB): DataFrame = {
    val m = 1 << b
    // functions.shiftleft only takes a literal shift; the catalyst
    // ShiftLeft expression itself accepts a column — go through SQL
    val term = expr(s"shiftleft(CAST(1 AS BIGINT), ${rankMax(b)} - reg_rank)")
      .cast(DecimalType(38, 0))
    val present = count(lit(1))
    regs.groupBy(groupCols.map(col): _*)
      .agg(
        (sum(term) +
          (lit(m) - present).cast(DecimalType(38, 0)) *
            lit(1L << rankMax(b)).cast(DecimalType(38, 0)))
          .as("harmonic_scaled"),
        (lit(m) - present).cast(LongType).as("zero_regs"))
      .withColumn("n_est",
        lit(alphaM2Scaled(b)) / col("harmonic_scaled").cast(DoubleType))
  }

  /** Standard small-range (linear counting) correction — driver-side
    * semantics, NOT cross-engine deterministic (ln differs per libm).
    */
  def corrected(nEst: Double, zeroRegs: Long, b: Int = defaultB): Double = {
    val m = (1 << b).toDouble
    if (nEst < 2.5 * m && zeroRegs > 0) m * math.log(m / zeroRegs) else nEst
  }

  /** The DuckDB mirror of [[estimate]], generated from the same
    * constants (single source of truth for b and the numerator).
    */
  def oracleSql(table: String, groupCols: Seq[String], valueExpr: String,
      b: Int = defaultB): String = {
    val m = 1 << b
    val rmax = rankMax(b)
    val h = s"cast(('0x' || substr(md5(cast($valueExpr as varchar)), 1, 15)) as bigint)"
    val grp = groupCols.mkString(", ")
    s"""WITH hashed AS (
       |  SELECT $grp, $h % $m AS reg_idx, $h // $m AS w FROM $table),
       |ranked AS (
       |  SELECT $grp, reg_idx,
       |    max(CASE WHEN w = 0 THEN $rmax
       |        ELSE ${width(b) + 1} - length(bin(w)) END) AS reg_rank
       |  FROM hashed GROUP BY ${(1 to groupCols.size + 1).mkString(", ")}),
       |agg AS (
       |  SELECT $grp,
       |    cast(sum(cast(1::BIGINT << ($rmax - reg_rank) as decimal(38,0))) +
       |      cast($m - count(*) as decimal(38,0)) *
       |        cast(1::BIGINT << $rmax as decimal(38,0)) as decimal(38,0))
       |      AS harmonic_scaled,
       |    cast($m - count(*) as bigint) AS zero_regs
       |  FROM ranked GROUP BY ${(1 to groupCols.size).mkString(", ")})
       |SELECT $grp, harmonic_scaled, zero_regs,
       |  ${alphaM2Scaled(b)} / cast(harmonic_scaled as double) AS n_est
       |FROM agg""".stripMargin
  }

  /** DuckDB mirror of the REGISTER-MERGE rollup law: estimate at the
    * coarse grain two ways — max-merging the fine-grain registers vs
    * sketching directly — and emit both (they are EQUAL by the
    * sketch's defining property; the oracle hash pins it). Same
    * constants as [[oracleSql]] — single source of truth.
    */
  def rollupOracleSql(table: String, fineCols: Seq[String],
      coarseCols: Seq[String], valueExpr: String,
      b: Int = defaultB): String = {
    require(coarseCols.forall(fineCols.contains), "coarse ⊆ fine")
    val m = 1 << b
    val rmax = rankMax(b)
    val h = s"cast(('0x' || substr(md5(cast($valueExpr as varchar)), 1, 15)) as bigint)"
    val fg = fineCols.mkString(", ")
    val cg = coarseCols.mkString(", ")
    def aggTail(src: String, grp: Seq[String], out: String) =
      s"""SELECT ${grp.mkString(", ")},
         |    ${alphaM2Scaled(b)} / cast(
         |      cast(sum(cast(1::BIGINT << ($rmax - reg_rank) as decimal(38,0))) +
         |        cast($m - count(*) as decimal(38,0)) *
         |          cast(1::BIGINT << $rmax as decimal(38,0)) as decimal(38,0))
         |      as double) AS $out
         |  FROM $src GROUP BY ${(1 to grp.size).mkString(", ")}""".stripMargin
    s"""WITH hashed AS (
       |  SELECT $fg, $h % $m AS reg_idx, $h // $m AS w FROM $table),
       |fine AS (
       |  SELECT $fg, reg_idx,
       |    max(CASE WHEN w = 0 THEN $rmax
       |        ELSE ${width(b) + 1} - length(bin(w)) END) AS reg_rank
       |  FROM hashed GROUP BY ${(1 to fineCols.size + 1).mkString(", ")}),
       |mergedregs AS (
       |  SELECT $cg, reg_idx, max(reg_rank) AS reg_rank
       |  FROM fine GROUP BY ${(1 to coarseCols.size + 1).mkString(", ")}),
       |merged AS (
       |  ${aggTail("mergedregs", coarseCols, "n_est_merged")}),
       |directregs AS (
       |  SELECT $cg, reg_idx,
       |    max(CASE WHEN w = 0 THEN $rmax
       |        ELSE ${width(b) + 1} - length(bin(w)) END) AS reg_rank
       |  FROM hashed GROUP BY ${(1 to coarseCols.size + 1).mkString(", ")}),
       |direct AS (
       |  ${aggTail("directregs", coarseCols, "n_est_direct")})
       |SELECT m.*, d.n_est_direct
       |FROM merged m JOIN direct d USING ($cg)""".stripMargin
  }
}
