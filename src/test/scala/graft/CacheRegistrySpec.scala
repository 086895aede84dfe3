package graft

import org.apache.spark.storage.StorageLevel

/** Session-scoping contract of [[CacheRegistry]]: releasing one
  * session's transient caches must not drop a concurrent session's
  * (round-5 advice — the flat registry let `releaseAll` clear other
  * callers' caches in a shared JVM).
  */
class CacheRegistrySpec extends SparkSpec {

  test("release(session) leaves a concurrent session's caches persisted") {
    val other = spark.newSession()
    // distinct plans on purpose: the JVM-wide CacheManager unifies
    // identical plans into one InMemoryRelation across sessions, which
    // would make the two handles share one cache entry
    val mine = CacheRegistry.register(
      spark.range(0, 100).toDF("v").persist(StorageLevel.MEMORY_AND_DISK))
    val theirs = CacheRegistry.register(
      other.range(0, 57).toDF("v").persist(StorageLevel.MEMORY_AND_DISK))
    mine.count(); theirs.count()
    assert(CacheRegistry.registeredCount(spark) >= 1)
    assert(CacheRegistry.registeredCount(other) === 1)

    CacheRegistry.release(spark)
    assert(mine.storageLevel === StorageLevel.NONE)     // released
    assert(theirs.storageLevel === StorageLevel.MEMORY_AND_DISK) // untouched
    assert(CacheRegistry.registeredCount(spark) === 0)
    assert(CacheRegistry.registeredCount(other) === 1)

    CacheRegistry.release(other)
    assert(theirs.storageLevel === StorageLevel.NONE)
    assert(CacheRegistry.registeredCount(other) === 0)
  }

  test("releaseAll() resolves to the active session only") {
    val other = spark.newSession()
    val mine = CacheRegistry.register(
      spark.range(0, 10).toDF("v").persist(StorageLevel.MEMORY_AND_DISK))
    val theirs = CacheRegistry.register(
      other.range(0, 23).toDF("v").persist(StorageLevel.MEMORY_AND_DISK))
    mine.count(); theirs.count()

    // the suite's shared session is the thread's active session, so the
    // legacy no-arg call must release only ITS frames
    org.apache.spark.sql.SparkSession.setActiveSession(spark)
    CacheRegistry.releaseAll()
    assert(mine.storageLevel === StorageLevel.NONE)
    assert(theirs.storageLevel === StorageLevel.MEMORY_AND_DISK)
    // the explicit teardown sweep reaches the abandoned session too
    CacheRegistry.releaseAllSessions()
    assert(theirs.storageLevel === StorageLevel.NONE)
    assert(CacheRegistry.registeredCount(other) === 0)
  }
}
