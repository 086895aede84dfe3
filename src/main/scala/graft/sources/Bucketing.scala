package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout — the storage-side half of the co-located
  * join strategy (SURVEY §4 "partitioning & shuffle"): writing both
  * sides of a recurring big-big join bucketed (and optionally sorted)
  * by the join key lets every subsequent join run with ZERO exchanges —
  * the shuffle is paid once at write time instead of per query. At
  * 100 TB this is the difference between re-shuffling the fact table on
  * every pipeline run and never shuffling it again.
  *
  * Rules for the shuffle to actually disappear (spec-pinned):
  *  - both tables bucketed by the join key with the SAME bucket count;
  *  - the join is an equi-join on exactly the bucket columns;
  *  - `spark.sql.sources.bucketing.enabled` (default true).
  * Sorted buckets additionally drop the per-task sort of a sort-merge
  * join. Bucket count sizes the read parallelism — pick it like a
  * shuffle partition count (data / ~128 MB), not like a cluster size.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally bucket-sorted) parquet
    * table. Overwrites any existing table of that name. With `path`
    * the table is EXTERNAL at that location — required when the
    * session catalog is in-memory (a new JVM forgets managed tables
    * but their warehouse directories survive, and a managed
    * saveAsTable then fails with LOCATION_ALREADY_EXISTS; an external
    * location is allowed to pre-exist). Note the catalog is still
    * what carries the bucketing spec: Spark only plans bucketed scans
    * for CATALOG tables, so cross-process reuse of a bucketed layout
    * needs a persistent metastore — without one, each process
    * re-registers (rewrites) the table, which this drop-first
    * overwrite makes idempotent.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sortCols: Seq[String] = Nil,
      path: Option[String] = None): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val base = df.write.mode("overwrite").format("parquet")
    val w = path.fold(base)(p => base.option("path", p))
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Append rows to an EXISTING bucketed table. The spec must match
    * the table's (same bucket columns/count/sort) — Spark enforces
    * this, so a drifted caller fails loudly instead of silently
    * breaking the bucketed-scan contract. Each append lands new
    * per-bucket files; compaction policy is the caller's
    * (see ops.Compaction).
    */
  def appendBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    val w = df.write.mode("append").format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** True iff the executed plan of `df` contains no shuffle exchange —
    * the property bucketed co-located joins buy. Requires a plan built
    * with AQE off: the adaptive wrapper hides its children until
    * execution, which would make every plan look shuffle-free — fail
    * loudly instead of returning that false positive.
    */
  def shuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan
    require(!plan.isInstanceOf[
      org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec],
      "disable spark.sql.adaptive.enabled before inspecting for shuffles")
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.isEmpty
  }
}
