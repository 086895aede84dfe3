package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — classify every key across two versions of a
  * table as added / removed / changed / unchanged, by content
  * fingerprint. The incremental-ingest audit primitive: "what did this
  * crawl refresh actually change", the input to incremental dedup
  * (only `added`/`changed` rows need re-deduplication) and to
  * training-set changelogs.
  *
  * Scale shape: each side is reduced to (key, fingerprint) BEFORE the
  * shuffle — the fingerprint is computed in the scan's projection, so
  * the wide content column never moves — then one full-outer
  * equi-join on the key compares the two hashes. Two narrow map
  * stages + one join shuffle, regardless of document width. The
  * output carries keys + status only; callers join it back to
  * whichever side they need (Spark prunes the unused columns).
  */
object SnapshotDiff {

  /** Per-key status: (keyCols…, status ∈ added|removed|changed|
    * unchanged). `fingerprint` is evaluated against each side's rows
    * (e.g. `md5(col("text"))`, or a struct hash over several columns).
    * Keys must be unique per side — pre-aggregate multi-row keys
    * first (the operator asserts nothing; duplicate keys join
    * many-to-many like any equi-join would).
    */
  def diff(oldDf: DataFrame, curDf: DataFrame, keyCols: Seq[String],
      fingerprint: Column): DataFrame = {
    require(keyCols.nonEmpty, "need key columns")
    // explicit presence flags: a NULL FINGERPRINT (e.g. md5 of a NULL
    // content column) must not masquerade as key absence — presence is
    // decided by the row existing, fingerprints only decide
    // changed-vs-unchanged (null-safely: NULL <=> NULL is unchanged)
    val o = oldDf.select(keyCols.map(col) ++
      Seq(fingerprint.as("__fp_old"), lit(true).as("__in_old")): _*)
    val c = curDf.select(keyCols.map(col) ++
      Seq(fingerprint.as("__fp_cur"), lit(true).as("__in_cur")): _*)
    o.join(c, keyCols, "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_cur").isNull, lit("removed"))
          .when(col("__fp_old") <=> col("__fp_cur"), lit("unchanged"))
          .otherwise(lit("changed")))
      .drop("__fp_old", "__fp_cur", "__in_old", "__in_cur")
  }
}
