package graft

import org.apache.spark.sql.DataFrame

/** Registry for TRANSIENT persisted DataFrames (LSH buckets, rollup
  * levels…) so long-lived sessions can release them after the consuming
  * action instead of leaking cached blocks until eviction (round-1
  * advice: repeated Dedup/rollup invocations accumulated
  * MEMORY_AND_DISK blocks for the life of the session).
  *
  * Operators register what they persist; the session owner calls
  * [[releaseAll]] once the query's terminal action has run. Releasing
  * is always safe — a released frame that is consumed again simply
  * recomputes from lineage.
  */
object CacheRegistry {
  private val frames = scala.collection.mutable.ArrayBuffer[DataFrame]()

  def register(df: DataFrame): DataFrame = synchronized { frames += df; df }

  def releaseAll(blocking: Boolean = false): Unit = synchronized {
    frames.foreach(f => try f.unpersist(blocking) catch { case _: Throwable => () })
    frames.clear()
  }
}
