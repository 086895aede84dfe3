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
  /** Two-arm log-rank test (Mantel 1966) over per-entity durations:
    * the significance companion to [[kaplanMeier]] — "are these two
    * survival curves the same?" via observed-vs-expected deaths at
    * every pooled event time.
    *
    *   E₁ = Σ_t d_t·n₁t/n_t      V = Σ_t d_t(n_t−d_t)n₁t·n₂t
    *                                     ───────────────────
    *                                      n_t²(n_t−1)
    *   χ² = (O₁−E₁)²/V
    *
    * Determinism: risk sets and death counts are exact integers (the
    * pooled-time × arm join below — no window alignment); each E/V
    * TERM is one decimal→double division quantized to integer
    * micro-units, so the cross-time SUMS are exact longs in any
    * partition order; χ² and the hazard ratio are final double
    * steps, round(·,6)-ed. Times with n_t ≤ 1 contribute 0 variance
    * (guarded — the raw formula divides by zero there).
    *
    * Scale shape: one per-(arm, t) aggregate, a pooled-times × arm
    * join bounded by |distinct times|² (day-grained: tiny), one
    * 1-row reduce.
    */
  def logRank(df: DataFrame, armCol: String, durCol: String,
      observedCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val lt = df.groupBy(col(armCol).as("arm"),
        col(durCol).cast(LongType).as("t"))
      .agg(sum(when(col(observedCol), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("tot"))
    // per-arm risk set at every POOLED time: arm entities with
    // duration ≥ t (a times×times join on the tiny life table — no
    // per-arm window to misalign when an arm lacks a time)
    val times = lt.filter(col("d") > 0).select(col("t")).distinct()
    val risk = times.alias("tm")
      .join(lt.alias("l"), col("l.t") >= col("tm.t"))
      .groupBy(col("tm.t").as("t"), col("l.arm").as("arm"))
      .agg(sum(col("l.tot")).cast(dec).as("n_at"),
        sum(when(col("l.t") === col("tm.t"), col("l.d")).otherwise(0L))
          .cast(dec).as("d_at"))
    val byT = risk.groupBy(col("t"))
      .agg(
        sum(when(col("arm"), col("d_at")).otherwise(lit(0).cast(dec)))
          .as("d1"),
        sum(when(!col("arm"), col("d_at")).otherwise(lit(0).cast(dec)))
          .as("d2"),
        sum(when(col("arm"), col("n_at")).otherwise(lit(0).cast(dec)))
          .as("n1"),
        sum(when(!col("arm"), col("n_at")).otherwise(lit(0).cast(dec)))
          .as("n2"))
      .select(col("t"), col("d1"), col("d2"), col("n1"), col("n2"),
        (col("d1") + col("d2")).as("dt"), (col("n1") + col("n2")).as("nt"))
    val eTerm = round((col("dt") * col("n1") * lit(1000000).cast(dec))
      .cast(DoubleType) / col("nt").cast(DoubleType)).cast(LongType)
    val vTerm = when(col("nt") > 1, round(
      (col("dt") * (col("nt") - col("dt")) * col("n1") * col("n2") *
        lit(1000000).cast(dec)).cast(DoubleType) /
        (col("nt") * col("nt") * (col("nt") - lit(1).cast(dec)))
          .cast(DoubleType)).cast(LongType)).otherwise(0L)
    val agg = byT.agg(
      sum(col("d1")).cast(LongType).as("o1"),
      sum(col("d2")).cast(LongType).as("o2"),
      sum(eTerm).as("e1_micro"), sum(vTerm).as("v_micro"))
    agg.select(col("o1"), col("o2"),
      round(col("e1_micro").cast(DoubleType) / 1e6, 6).as("e1"),
      round((col("o1") + col("o2")).cast(DoubleType) -
        col("e1_micro").cast(DoubleType) / 1e6, 6).as("e2"),
      round(col("v_micro").cast(DoubleType) / 1e6, 6).as("v"),
      round((col("o1").cast(DoubleType) -
          col("e1_micro").cast(DoubleType) / 1e6) *
        (col("o1").cast(DoubleType) -
          col("e1_micro").cast(DoubleType) / 1e6) /
        (col("v_micro").cast(DoubleType) / 1e6), 6).as("chi2"))
  }

  /** DuckDB mirror of [[logRank]] over a CTE/table `src` with columns
    * (arm BOOLEAN, dur, observed).
    */
  def logRankOracleSql(src: String): String =
    s"""lt AS (
       |  SELECT arm, cast(dur as bigint) AS t,
       |    cast(sum(CASE WHEN observed THEN 1 ELSE 0 END) as bigint) AS d,
       |    cast(count(*) as bigint) AS tot
       |  FROM $src GROUP BY 1, 2),
       |times AS (SELECT DISTINCT t FROM lt WHERE d > 0),
       |risk AS (
       |  SELECT tm.t AS t, l.arm AS arm,
       |    cast(sum(l.tot) as decimal(38,0)) AS n_at,
       |    cast(sum(CASE WHEN l.t = tm.t THEN l.d ELSE 0 END)
       |      as decimal(38,0)) AS d_at
       |  FROM times tm JOIN lt l ON l.t >= tm.t
       |  GROUP BY 1, 2),
       |byt AS (
       |  SELECT t,
       |    sum(CASE WHEN arm THEN d_at ELSE 0 END) AS d1,
       |    sum(CASE WHEN NOT arm THEN d_at ELSE 0 END) AS d2,
       |    sum(CASE WHEN arm THEN n_at ELSE 0 END) AS n1,
       |    sum(CASE WHEN NOT arm THEN n_at ELSE 0 END) AS n2,
       |    sum(d_at) AS dt, sum(n_at) AS nt
       |  FROM risk GROUP BY 1),
       |terms AS (
       |  SELECT d1, d2,
       |    cast(round(cast(dt * n1 * 1000000 as double) /
       |      cast(nt as double)) as bigint) AS e_term,
       |    CASE WHEN nt > 1 THEN
       |      cast(round(cast(dt * (nt - dt) * n1 * n2 * 1000000 as double) /
       |        cast(nt * nt * (nt - 1) as double)) as bigint)
       |    ELSE 0 END AS v_term
       |  FROM byt),
       |lr AS (
       |  SELECT cast(sum(d1) as bigint) AS o1, cast(sum(d2) as bigint) AS o2,
       |    cast(sum(e_term) as bigint) AS e1_micro,
       |    cast(sum(v_term) as bigint) AS v_micro
       |  FROM terms),
       |logrank AS (
       |  SELECT o1, o2,
       |    round(cast(e1_micro as double) / 1000000, 6) AS e1,
       |    round(cast(o1 + o2 as double) - cast(e1_micro as double) / 1000000,
       |      6) AS e2,
       |    round(cast(v_micro as double) / 1000000, 6) AS v,
       |    round((cast(o1 as double) - cast(e1_micro as double) / 1000000) *
       |      (cast(o1 as double) - cast(e1_micro as double) / 1000000) /
       |      (cast(v_micro as double) / 1000000), 6) AS chi2
       |  FROM lr)""".stripMargin

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
