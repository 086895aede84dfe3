package graft.sources

import org.apache.spark.sql.DataFrame

/** Idempotent partitioned parquet ingest — the Spark analog of the
  * reference's delete-then-reload API-pull idempotency (each pull
  * deletes its (state, source, statcat, year) slice before COPY,
  * reference: src/nass.mk:107). Dynamic partition overwrite replaces
  * exactly the partitions present in `df`, leaving all others intact —
  * re-running a pull is a no-op-equivalent, and the layout doubles as
  * the table's partition pruning key at scale.
  */
object ParquetSink {
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    // per-writer option, NOT a session-conf set/restore: two concurrent
    // writers in one session (e.g. two foreachBatch sinks) would race
    // on the global conf, and a writer caught in "static" mode deletes
    // the ENTIRE target directory instead of only its partitions
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
