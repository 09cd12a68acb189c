package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle of the per-session scan memo (Tables.scanCache). r11
  * ADVICE/VERDICT: the memo had no invalidation path at all — entries
  * for retired sessions pinned their SparkSession/DataFrames for the
  * JVM lifetime. Pinned here: releaseAll clears it (the lifecycle every
  * session owner already runs), session eviction drops exactly that
  * session's entries, invalidate drops one path, and a dropped entry
  * rebuilds transparently on the next call. */
class ScanCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("releaseAll clears the scan memo") {
    assert(Tables.table(spark, sfDir, "region").count() > 0)
    assert(Tables.cacheHolds(spark), "memo must hold after a table() call")
    Resources.releaseAll()
    assert(!Tables.cacheHolds(spark), "releaseAll must clear the memo")
  }

  test("memoized scan is the SAME Dataset object until evicted, fresh after") {
    val a = Tables.table(spark, sfDir, "nation")
    val b = Tables.table(spark, sfDir, "nation")
    assert(a eq b, "repeat call must return the memoized Dataset")
    Tables.evictSession(spark)
    assert(!Tables.cacheHolds(spark))
    val c = Tables.table(spark, sfDir, "nation")
    assert(!(a eq c), "post-eviction call must rebuild the scan")
    assert(c.count() === a.count())
  }

  test("eviction is per-session: another session's entries survive") {
    val other = spark.newSession()
    assert(Tables.table(spark, sfDir, "region").count() > 0)
    assert(Tables.table(other, sfDir, "region").count() > 0)
    assert(Tables.cacheHolds(spark) && Tables.cacheHolds(other))
    Tables.evictSession(other)
    assert(Tables.cacheHolds(spark), "sibling session must keep its memo")
    assert(!Tables.cacheHolds(other))
    Resources.releaseAll()
  }

  test("invalidate drops one path (both floor variants), keeps the rest") {
    val r1 = Tables.table(spark, sfDir, "region")
    val n1 = Tables.table(spark, sfDir, "nation")
    val rRaw1 = Tables.raw(spark, sfDir, "region")
    Tables.invalidate(spark, s"$sfDir/region.parquet")
    val r2 = Tables.table(spark, sfDir, "region")
    val rRaw2 = Tables.raw(spark, sfDir, "region")
    val n2 = Tables.table(spark, sfDir, "nation")
    assert(!(r1 eq r2), "floored region scan must be rebuilt")
    assert(!(rRaw1 eq rRaw2), "raw region scan must be rebuilt")
    assert(n1 eq n2, "nation scan must be untouched")
    Resources.releaseAll()
  }
}
