package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * runtime skew-join split can't apply (e.g. non-shuffle joins or
  * pre-AQE engines). The big side gets a deterministic salt derived
  * from a row-unique column; the small side is replicated `salts`
  * times so every salted key still finds its match. The shuffle spreads
  * each hot key over `salts` reducers.
  *
  * Result equals the plain join ONLY for join types whose output is
  * driven by the big (salted) side: inner, left outer, left semi, left
  * anti. Right/full-outer would emit unmatched SMALL-side rows once per
  * salt replica (duplicated relative to the plain join) — rejected.
  *
  * Deterministic by construction (salt = pmod(hash(saltBy), salts)) —
  * no rand(), so retries/speculative tasks can't diverge.
  */
object SkewJoin {
  private val supported = Set("inner", "left", "leftouter",
    "leftsemi", "semi", "leftanti", "anti")

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltBy: Column,
      salts: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(supported.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports big-side-driven join types $supported, not '$joinType' " +
        "(right/full outer would duplicate unmatched small-side rows per salt)")
    val salted = big.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
