package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reconciliation of *reported* vs *synthesized* measures after a
  * full-outer join of the two branches — the reference's consumer idiom
  * downstream of every rollup (reference: src/nass.sql:236-249
  * `greatest(t.x, s.x)`; :360-376,438-443 `coalesce(t.x, s.x)`).
  *
  * Join with `Seq`-based keys (USING semantics: single coalesced key
  * columns) then apply the policy per measure. `greatest` skips NULLs in
  * both PG and Spark; `coalesce` = reported wins, rollup fills gaps.
  */
object Reconcile {

  sealed trait Policy { def apply(t: Column, s: Column): Column }
  /** take the larger of reported/summed, NULL-skipping */
  case object Greatest extends Policy {
    def apply(t: Column, s: Column): Column = greatest(t, s)
  }
  /** reported wins; synthesized fills gaps */
  case object ReportedFirst extends Policy {
    def apply(t: Column, s: Column): Column = coalesce(t, s)
  }

  /** Full-outer join `reported` ⋈ `synthesized` on `keys`, emitting for
    * each measure m: t_m (reported), s_m (synthesized), m (reconciled by
    * `policy`), plus a `reported` boolean flag (PG `t is not null`
    * row-test ≈ "reported side matched", src/nass.sql:238).
    */
  def reconcile(
      reported: DataFrame,
      synthesized: DataFrame,
      keys: Seq[String],
      measures: Seq[String],
      policy: Policy): DataFrame = {
    val t = reported.select((keys ++ measures).map(col).toIndexedSeq: _*)
      .withColumn("__t_matched", lit(true))
    val s0 = synthesized.select((keys ++ measures).map(col).toIndexedSeq: _*)
    val s = measures.foldLeft(s0)((d, m) => d.withColumnRenamed(m, s"s_$m"))
    val joined = measures.foldLeft(t)((d, m) => d.withColumnRenamed(m, s"t_$m"))
      .join(s, keys, "full_outer")
    val out = keys.map(col) ++
      Seq(coalesce(col("__t_matched"), lit(false)).as("reported")) ++
      measures.flatMap(m => Seq(
        col(s"t_$m"), col(s"s_$m"),
        policy(col(s"t_$m"), col(s"s_$m")).as(m)))
    joined.select(out.toIndexedSeq: _*)
  }
}
