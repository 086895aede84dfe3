package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-entity sequential folds over time-ordered events — the
  * recurrence family (EWMA here) that frame-based window functions
  * cannot express: y_i = α·x_i + (1−α)·y_{i−1} depends on the FULL
  * prefix, and unrolling it as a weighted window sum needs (1−α)^−i
  * factors that overflow doubles after a few hundred steps.
  *
  * Scale shape: ONE hash shuffle keyed by entity, then a per-group
  * sort + fold over that entity's own events — state is bounded by
  * the per-entity event count (the sessionize/mapGroups discipline),
  * never by the corpus. The fold runs inside `aggregate` over a
  * `collect_list` array: higher-order lambdas evaluate interpreted,
  * which is the right trade for a bounded per-group recurrence (a
  * custom codegen kernel would buy nothing — the shuffle dominates).
  *
  * Determinism: events order by (ts, idCol) — a total order, so ties
  * in ts cannot reorder the fold; the state lives in integer
  * MICRO-UNITS (an integral double), re-quantized with a scale-0
  * round each step. Rounding a raw double to 6 dp per step is NOT
  * engine-stable (Spark's BigDecimal HALF_UP vs DuckDB's rounding
  * disagree within one ulp of a .5·10⁻⁶ boundary — measured 3/150
  * divergent users over ~60-step chains); rounding an integral-micro
  * state is, because with α a multiple of 1/4 every step's value is
  * an EXACT multiple of 0.25 (quarters are powers of two), so both
  * engines see identical representable inputs at every round.
  */
object TimeSeries {

  /** (entityCol, n_events, ewma): exponentially weighted moving
    * average of `valueCol` per entity, seeded with the first value
    * (list_reduce semantics: the first element IS the init).
    */
  def ewma(df: DataFrame, entityCol: String, tsCol: String,
      idCol: String, valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1]")
    require(alpha * 4 == (alpha * 4).round.toDouble,
      "alpha must be a multiple of 1/4 for the exact-quarters replay " +
        "guarantee (see the determinism note above)")
    val ordered = array_sort(collect_list(struct(
      col(tsCol).as("t"), col(idCol).as("i"),
      round(col(valueCol).cast(DoubleType) * 1e6).as("v"))))
    df.groupBy(col(entityCol))
      .agg(ordered.as("__evs"))
      .select(col(entityCol),
        size(col("__evs")).cast(LongType).as("n_events"),
        round(aggregate(
          expr("slice(__evs, 2, size(__evs))"),
          element_at(col("__evs"), 1).getField("v"),
          (acc: Column, x: Column) =>
            round(x.getField("v") * alpha + acc * (1.0 - alpha)))
          / 1e6, 6).as("ewma"))
  }
}
