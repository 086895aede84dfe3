package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-parallelism hints for expression-heavy narrow map stages.
  *
  * A small parquet file is a single split, so a pipeline like
  * md5-shingle → minhash runs on ONE core no matter how many the
  * session has (observed: the whole sf0.1 documents table is one 1.5 MB
  * row group). At production scale the input arrives in thousands of
  * splits and this is a no-op — the widen is conditional on the actual
  * partition count, so it costs nothing where it isn't needed.
  */
object Parallelism {

  /** Round-robin repartition up to the session's default parallelism,
    * only when the plan currently has fewer partitions. The shuffle
    * moves only the raw input (small by precondition); the expensive
    * downstream expressions then run on every core.
    */
  def widen(df: DataFrame, target: Int = 0): DataFrame = {
    val t =
      if (target > 0) target
      else df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < t) df.repartition(t) else df
  }
}
