package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-DIMENSION corpus statistics of an embedding column — the
  * preprocessing pass every quantizer pipeline runs before training:
  * per-dim mean for centering, variance for subspace allocation /
  * whitening decisions (OPQ rotates to balance exactly these), and
  * min/max for the SQ dynamic range. One narrow posexplode + one
  * partial-aggregated shuffle whose OUTPUT is dim-bounded (64 rows
  * for a 64-d corpus, at any corpus size) — the bounded-model-state
  * class.
  *
  * Determinism discipline: components round to 6dp (squares to 9dp)
  * and sum as DECIMAL, so the reduction is exact and
  * partition-order-independent — a double Σx over 100 TB is neither;
  * mean/variance finalize as doubles from the exact sums. The oracle
  * (`q_dim_stats`) replays the quantization and the decimal sums.
  */
object VecStats {

  /** Output: (dim, n, mean, variance, lo, hi) — one row per vector
    * dimension; NULL components are skipped (they carry no mass).
    */
  def dimStats(df: DataFrame, vecCol: String): DataFrame = {
    val xs = df
      .select(posexplode(col(vecCol)).as(Seq("dim", "xf")))
      .filter(col("xf").isNotNull)
      .select(col("dim").cast(LongType).as("dim"),
        col("xf").cast(DoubleType).as("x"))
    xs.groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("x"), 6).cast(DecimalType(18, 6))).as("__s1"),
        sum(round(col("x") * col("x"), 9).cast(DecimalType(27, 9))).as("__s2"),
        min(col("x")).as("lo"), max(col("x")).as("hi"))
      .withColumn("mean",
        round(col("__s1").cast(DoubleType) / col("n"), 6))
      .withColumn("variance", // clamp: E[x²]−mean² of independently
        // rounded sums can dip a few ulps negative on near-constant
        // dims (→ NaN under a later sqrt, and -0.0 breaks hash gates)
        round(greatest(col("__s2").cast(DoubleType) / col("n") -
          col("mean") * col("mean"), lit(0.0)), 6))
      .select(col("dim"), col("n"), col("mean"), col("variance"),
        col("lo"), col("hi"))
  }
}
