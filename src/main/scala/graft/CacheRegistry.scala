package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry for TRANSIENT persisted DataFrames (LSH buckets, rollup
  * levels…) so long-lived sessions can release them after the consuming
  * action instead of leaking cached blocks until eviction (round-1
  * advice: repeated Dedup/rollup invocations accumulated
  * MEMORY_AND_DISK blocks for the life of the session).
  *
  * Frames are keyed by the SparkSession that built them, so concurrent
  * sessions sharing one JVM cannot release each other's caches
  * (round-5 advice: the flat global registry made `releaseAll` a
  * cross-session footgun). Operators register what they persist; the
  * session owner calls [[releaseAll]] (its own session) or
  * [[release]] (an explicit session) once the query's terminal action
  * has run. Releasing is always safe — a released frame that is
  * consumed again simply recomputes from lineage.
  */
object CacheRegistry {
  private val frames =
    scala.collection.mutable.LinkedHashMap[SparkSession,
      scala.collection.mutable.ArrayBuffer[DataFrame]]()

  def register(df: DataFrame): DataFrame = synchronized {
    frames.getOrElseUpdate(df.sparkSession,
      scala.collection.mutable.ArrayBuffer[DataFrame]()) += df
    df
  }

  /** Number of frames currently registered for `session` (test probe). */
  def registeredCount(session: SparkSession): Int = synchronized {
    frames.get(session).map(_.size).getOrElse(0)
  }

  /** Release only the caches registered under `session`. */
  def release(session: SparkSession, blocking: Boolean = false): Unit =
    synchronized {
      frames.remove(session).foreach(_.foreach(f =>
        try f.unpersist(blocking) catch { case _: Throwable => () }))
    }

  /** Release the calling context's caches: the thread's active (else
    * default) session if one is set — a different session's frames are
    * left alone — falling back to a full release when no session is
    * resolvable (JVM teardown).
    */
  def releaseAll(blocking: Boolean = false): Unit = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
      case Some(s) => release(s, blocking)
      case None => synchronized {
        frames.valuesIterator.foreach(_.foreach(f =>
          try f.unpersist(blocking) catch { case _: Throwable => () }))
        frames.clear()
      }
    }
  }
}
