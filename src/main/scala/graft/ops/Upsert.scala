package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog application (CDC upsert-with-deletes) — the
  * incremental-refresh primitive: fold a stream of keyed change rows
  * into a base snapshot, newest version per key wins, keys whose
  * newest version is a tombstone disappear. This is the batch twin of
  * a streaming materialized view: ingest day N's changelog against the
  * day N−1 snapshot without recomputing the corpus.
  *
  * Scale shape: ONE key-partitioned shuffle — the union of base and
  * changelog aggregated with `max_by(row, version)`, which
  * partial-aggregates map-side (each map task keeps one candidate row
  * per key), so the shuffle carries at most one row per key per map
  * partition. No window sort, no join. Deterministic for any total
  * ordering of `versionCols` (break ties with a unique id column).
  */
object Upsert {

  /** Apply `changelog` to `base`: latest version per key across both
    * survives, unless it is a delete. `base` rows are assumed live
    * (their `isDelete` is false); `isDelete` is evaluated on changelog
    * rows. Output schema = input schema (both frames must share it).
    */
  def applyChangelog(base: DataFrame, changelog: DataFrame,
      keyCols: Seq[String], versionCols: Seq[String],
      isDelete: Column): DataFrame =
    applyChangelogRetain(base.withColumn("__deleted", lit(false)),
      changelog, keyCols, versionCols, isDelete)
      .where(!col("__deleted")).drop("__deleted")

  /** Tombstone-RETAINING fold: like [[applyChangelog]], but `base`
    * carries (and the output keeps) a `__deleted` marker column, so a
    * key's delete VERSION survives in the snapshot. This is what an
    * incremental maintainer must persist: with tombstones dropped, a
    * late out-of-order upsert older than the delete would find no base
    * row and silently resurrect the key. Readers filter `!__deleted`;
    * compact tombstones out only once the changelog source can no
    * longer emit versions below them (retention watermark).
    */
  def applyChangelogRetain(base: DataFrame, changelog: DataFrame,
      keyCols: Seq[String], versionCols: Seq[String],
      isDelete: Column): DataFrame = {
    require(keyCols.nonEmpty && versionCols.nonEmpty)
    require(base.columns.contains("__deleted"),
      "retaining base must carry the __deleted marker")
    val cols = base.columns.toSeq
    val u = base.unionByName(changelog.withColumn("__deleted", isDelete))
    // resolve by EXACT name (backtick-quoted col / getField), never the
    // dotted-path parse: a value column named "pay.load" must ride the
    // struct as one field, not as a nested lookup that fails analysis
    def qc(c: String): Column = col("`" + c.replace("`", "``") + "`")
    val valueCols = cols.filterNot(keyCols.contains)
    u.groupBy(keyCols.map(qc): _*)
      .agg(max_by(struct(valueCols.map(qc): _*),
        struct(versionCols.map(qc): _*)).as("__v"))
      .select((keyCols.map(qc) ++
        valueCols.map(c => col("__v").getField(c).as(c))): _*)
  }
}
