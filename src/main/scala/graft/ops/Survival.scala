package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kaplan–Meier survival estimation per cohort — retention expressed
  * the way the survival literature does it (Kaplan & Meier 1958):
  * right-censored entities contribute to the risk set up to their
  * censoring time without counting as churn, which plain retention
  * curves get wrong for every still-active user.
  *
  *   S(t) = Π_{tᵢ ≤ t} (nᵢ − dᵢ) / nᵢ
  *
  * with nᵢ = entities at risk at tᵢ (duration ≥ tᵢ, observed OR
  * censored) and dᵢ = observed events at tᵢ.
  *
  * Determinism (the [[TimeSeries]] recurrence contract): nᵢ and dᵢ
  * are exact integers; the running product folds in integer PPM —
  * acc' = round(acc·(nᵢ−dᵢ)/nᵢ) at scale 0, where acc·(nᵢ−dᵢ) is an
  * exact integral double (≤ 10⁶·n, far under 2⁵³) and the division is
  * one IEEE-correctly-rounded op, so both engines round the SAME
  * double and the whole curve replays bit-for-bit in SQL. A naive
  * exp(Σ ln(...)) formulation would hang the hash gate on libm
  * last-bit differences at every step.
  *
  * Scale shape: one per-entity aggregate (duration + censor flag),
  * one per-(cohort, t) aggregate, then ONE per-cohort fold over the
  * life table — whose length is bounded by the number of DISTINCT
  * event times per cohort (days, typically tens), never by entities.
  * The per-step prefix product re-folds the ≤t prefix per output row
  * (quadratic in table length) — the right trade while life tables
  * stay day-grained; at finer grain, pre-bucket times first.
  */
object Survival {

  /** Per-(cohort, t) life table + KM survival from per-entity
    * durations: input one row per entity with `cohortCol`,
    * integer `durCol` ≥ 0, and boolean `observedCol` (true = event
    * observed at dur, false = right-censored at dur). Output:
    * (cohort, t, n_risk, d, c, surv) for every t with dᵢ + cᵢ > 0,
    * surv carried at the 10⁻⁶ PPM grain.
    */
  def kaplanMeier(df: DataFrame, cohortCol: String, durCol: String,
      observedCol: String): DataFrame = {
    val lt = df.groupBy(col(cohortCol), col(durCol).cast(LongType).as("t"))
      .agg(sum(when(col(observedCol), 1L).otherwise(0L)).as("d"),
        sum(when(col(observedCol), 0L).otherwise(1L)).as("c"))
    // risk set = everyone whose duration is ≥ t: a descending-time
    // running sum over the (tiny) per-cohort life table
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(cohortCol)).orderBy(col("t").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val risk = lt.withColumn("n_risk", sum(col("d") + col("c")).over(w))
    // fold the ordered (t, d, c, n) prefix into the quantized KM product
    val steps = array_sort(collect_list(struct(
      col("t"), col("d"), col("c"), col("n_risk").as("n"))))
    risk.groupBy(col(cohortCol)).agg(steps.as("__lt"))
      .select(col(cohortCol), posexplode(col("__lt")).as(Seq("__pos", "__s")),
        col("__lt"))
      .select(col(cohortCol),
        col("__s.t").as("t"), col("__s.n").as("n_risk"),
        col("__s.d").as("d"), col("__s.c").as("c"),
        round(aggregate(
          expr("slice(__lt, 1, __pos + 1)"),
          lit(1000000L).cast(DoubleType),
          (acc: Column, s: Column) => round(
            acc * (s.getField("n") - s.getField("d")).cast(DoubleType) /
              s.getField("n").cast(DoubleType))) / 1e6, 6).as("surv"))
  }
}
