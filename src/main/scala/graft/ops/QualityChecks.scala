package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality report — count violations of row-level
  * constraints (null checks, range checks, format checks) and key-
  * uniqueness constraints over a frame: the pre-ingest gate every
  * production pipeline runs before promoting a batch (Deequ-style
  * "unit tests for data", reduced to its deterministic core).
  *
  * Scale shape: ALL row-level constraints ride ONE aggregate pass
  * over the scan (a `sum(when(violated, 1))` per check — no shuffle
  * beyond the single global aggregation); each uniqueness constraint
  * adds one groupBy on its key columns counting surplus rows. The
  * report is rows of (check, n_violations) — constant-size output
  * however wide the input.
  */
object QualityChecks {

  /** @param rowChecks  (name, violation predicate) — predicate TRUE
    *                   means the row violates the constraint; a NULL
    *                   predicate result counts as a violation (SQL
    *                   three-valued logic would otherwise silently
    *                   pass NULL rows through range checks)
    * @param uniqueKeys (name, key columns) — violations = rows beyond
    *                   the first per duplicated key tuple
    */
  def report(df: DataFrame, rowChecks: Seq[(String, Column)],
      uniqueKeys: Seq[(String, Seq[String])] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniqueKeys.nonEmpty, "need checks")
    val rowPart = if (rowChecks.isEmpty) Nil else {
      // positional internal aliases: user-facing check names may hold
      // any characters (dots would parse as field access in col())
      val aggs = rowChecks.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(coalesce(pred, lit(true)), 1L).otherwise(0L)).as(s"__c$i")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      Seq(one.select(explode(array(rowChecks.zipWithIndex.map { case ((n, _), i) =>
        struct(lit(n).as("check"),
          coalesce(col(s"__c$i"), lit(0L)).as("n_violations"))
      }: _*)).as("r")).select(col("r.check"), col("r.n_violations")))
    }
    val uniqPart = uniqueKeys.map { case (n, keys) =>
      // count alias chosen to dodge the user's key names (same
      // discipline as the positional row-check aliases above)
      val cnt = Iterator.from(0).map(i => s"__n$i")
        .find(c => !keys.contains(c)).get
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as(cnt))
        .agg(coalesce(sum(col(cnt) - 1L), lit(0L)).as("n_violations"))
        .select(lit(n).as("check"), col("n_violations"))
    }
    (rowPart ++ uniqPart).reduce(_.unionByName(_))
  }

  /** ZERO-pass variant of the row-level checks: the violation
    * counters ride the caller's OWN next action via `Dataset.observe`
    * — no second scan of the input at all, where [[report]] pays one.
    * This is the in-flight telemetry shape for a 100 TB write job:
    * attach the counters, run the write, read
    * `observation.get` after it finishes (counts reflect exactly the
    * rows the action processed). Uniqueness constraints need their
    * own grouped aggregate and deliberately stay [[report]]-only.
    *
    * Returns the frame to USE IN PLACE of `df` (observation columns
    * attach to it) and the handle to read after the action.
    */
  def observed(df: DataFrame, name: String,
      rowChecks: Seq[(String, Column)]): (DataFrame, org.apache.spark.sql.Observation) = {
    require(rowChecks.nonEmpty, "need at least one row check")
    val obs = org.apache.spark.sql.Observation(name)
    val aggs = rowChecks.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(pred, lit(true)), 1L).otherwise(0L)).as(s"__c$i")
    } :+ count(lit(1)).as("__rows")
    (df.observe(obs, aggs.head, aggs.tail: _*), obs)
  }

  /** Decode an [[observed]] result into (check, n_violations) pairs
    * plus the processed-row count, after the action completed.
    */
  def observedCounts(obs: org.apache.spark.sql.Observation,
      rowChecks: Seq[(String, Column)]): (Map[String, Long], Long) = {
    val row = obs.get
    (rowChecks.zipWithIndex.map { case ((n, _), i) =>
      n -> row(s"__c$i").asInstanceOf[Long]
    }.toMap, row("__rows").asInstanceOf[Long])
  }
}
