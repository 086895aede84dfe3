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
      partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
