package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's flagship smoke contract: `SparkEntry.entry` must return
  * rows (> 0) on the sf0.001 fixture. entry is q20's F1–F5 ingest chain
  * run as a batch query — already oracle-verified at every SF — but the
  * ENTRY POINT itself (hardcoded sf0.001 path, driver calling
  * convention) had no spec until r12. */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows on the sf0.001 fixture") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0L, "driver smoke check: entry must yield rows")
  }
}
