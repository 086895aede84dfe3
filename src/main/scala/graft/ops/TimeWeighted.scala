package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-weighted averaging over IRREGULAR samples — the telemetry
  * aggregate a plain `avg` silently gets wrong: a gauge sampled every
  * second while unhealthy and every hour while healthy is mostly
  * healthy, but the row-mean says the opposite. Each sample holds its
  * value until the next one (step interpolation, the standard gauge
  * semantics), so
  * `twa = Σ vᵢ·(tᵢ₊₁ − tᵢ) / (t_n − t_1)` per key.
  *
  * Determinism discipline: values quantize to integer MICROS and each
  * contribution multiplies as DECIMAL(18,0)×DECIMAL(18,0) (exact
  * 37-digit products — a Long×Long product would wrap silently) and
  * sums as DECIMAL — exact and
  * partition-order-independent where a double Σ v·Δt is neither; the
  * window orders by (ts, tie-break cols) so duplicate timestamps pair
  * deterministically (their Δt = 0 contributions vanish, but the
  * NEXT gap must attach to a determined row). Keys with one sample
  * have an empty span → NULL twa (documented, not 0).
  *
  * Scale shape: ONE per-key window (partitioned — never global) plus
  * the grouping aggregate; both shuffle on the key with AQE sizing.
  * The oracle replays lead(), the quantization, and the decimal sum.
  */
object TimeWeighted {

  /** @param ordCols tie-break columns making (tsCol, ordCols) a total
    *                order within each key (e.g. the event id)
    */
  /** Largest magnitude a DECIMAL(18,0) holds — inputs past this must
    * abort loudly: under non-ANSI mode the cast returns NULL and
    * `sum` SKIPS it, silently dropping the contribution from the TWA.
    */
  private val MaxDec18 = 999999999999999999L

  def timeWeightedAvg(df: DataFrame, keyCols: Seq[String], tsCol: String,
      valCol: String, ordCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && ordCols.nonEmpty,
      "need key columns and a tie-break order")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((tsCol +: ordCols).map(col): _*)
    val stepped = df
      .withColumn("__t", // integer ms (Column./ is double division)
        (unix_micros(col(tsCol)) / 1000).cast(LongType))
      // out-of-range gauge → raise_error, not a NULL the sum skips
      .withColumn("__micros",
        when(abs(col(valCol) * 1e6) > lit(MaxDec18.toDouble),
          raise_error(concat(
            lit("TimeWeighted: |value|*1e6 exceeds DECIMAL(18,0) for "),
            col(valCol).cast("string"))).cast(LongType))
          .otherwise(round(col(valCol) * 1e6).cast(LongType)))
      .withColumn("__next", lead(col("__t"), 1).over(w))
      // Δt is ms between consecutive samples of one key; an 18-digit
      // ms span (~31 Myr) means corrupt timestamps — abort, don't skew
      .withColumn("__dt",
        when(col("__next") - col("__t") > lit(MaxDec18),
          raise_error(concat(
            lit("TimeWeighted: inter-sample gap exceeds DECIMAL(18,0) ms at t="),
            col("__t").cast("string"))).cast(LongType))
          .otherwise(col("__next") - col("__t")))
      // multiply IN decimal: a Long×Long product of a 1e15-micros
      // gauge and a multi-hour Δms overflows 2^63 silently; two
      // 18-digit decimals multiply to 37 digits — exact, no wrap
      .withColumn("__contrib",
        col("__micros").cast(DecimalType(18, 0)) *
          col("__dt").cast(DecimalType(18, 0)))
    stepped.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_samples"),
        (max(col("__t")) - min(col("__t"))).as("span_ms"),
        sum(col("__contrib")).as("__sum"))
      .withColumn("twa",
        when(col("span_ms") > 0,
          round(col("__sum").cast(DoubleType) /
            (col("span_ms").cast(DoubleType) * 1e6), 6)))
      .drop("__sum")
  }
}
