package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry for TRANSIENT persisted DataFrames (LSH buckets, rollup
  * levels…) so long-lived sessions can release them after the consuming
  * action instead of leaking cached blocks until eviction (round-1
  * advice: repeated Dedup/rollup invocations accumulated
  * MEMORY_AND_DISK blocks for the life of the session).
  *
  * Frames are keyed by the SparkSession that built them, so a
  * `releaseAll`/`release` sweep never touches another session's
  * REGISTRATIONS (round-5 advice: the flat global registry made
  * `releaseAll` a cross-session footgun). Two caveats keep the
  * contract honest:
  *  - Spark's JVM-wide CacheManager unifies IDENTICAL plans into one
  *    InMemoryRelation across sessions; unpersisting one handle of
  *    such a shared plan uncaches it for every session (cost:
  *    recomputation, never wrong data). Per-session keying narrows
  *    the blast radius; it cannot split a shared cache entry.
  *  - Operators register under `df.sparkSession`. A caller running
  *    operators on a child session (`newSession`/`cloneSession`)
  *    must call `release(child)` — the no-arg [[releaseAll]] resolves
  *    the calling THREAD's active/default session, which may be the
  *    parent. Cached blocks of an abandoned session are pinned by the
  *    shared CacheManager (GC cannot reclaim them), so a JVM owner
  *    tearing everything down should call [[releaseAllSessions]].
  *
  * Releasing is always safe — a released frame that is consumed again
  * simply recomputes from lineage.
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

  /** Release EVERY session's registered caches — the teardown sweep
    * for JVM owners (and the recovery path for sessions abandoned
    * without a [[release]]).
    */
  def releaseAllSessions(blocking: Boolean = false): Unit = synchronized {
    frames.valuesIterator.foreach(_.foreach(f =>
      try f.unpersist(blocking) catch { case _: Throwable => () }))
    frames.clear()
  }

  /** Release the calling context's caches: the thread's active (else
    * default) session if one is set — a different session's frames are
    * left alone (see class doc for the child-session contract) —
    * falling back to [[releaseAllSessions]] when no session is
    * resolvable (JVM teardown).
    */
  def releaseAll(blocking: Boolean = false): Unit = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
      case Some(s) => release(s, blocking)
      case None => releaseAllSessions(blocking)
    }
  }
}
