package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the split-layout artifact (Tables.ensureSplitLayout): the
  * rewritten copy must be CONTENT-identical to the original (same rows,
  * any order), actually multi-split, and small tables must be left
  * alone. Row order is free to change — the repo-wide oracle discipline
  * already forbids order-dependent aggregations over scans. */
class SplitLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.1"

  /** Order-insensitive content signature: row count + XOR of per-row
    * 64-bit hashes over every column. */
  private def signature(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    // bit_xor, not sum: an ANSI-mode Long sum of 600k random 64-bit
    // hashes overflows and throws
    val h = df.select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(h)").as("s"))
      .head()
    (h.getLong(0), h.getLong(1))
  }

  test("split copy is content-identical, multi-split; small tables skipped") {
    // match ensureSplitLayout's read conf so a NANOS-era events fixture
    // reads the same logical type on both sides
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val before = Map(
      "lineitem" -> signature(spark.read.parquet(s"$sfDir/lineitem.parquet")),
      "events" -> signature(spark.read.parquet(s"$sfDir/events.parquet")))
    val savedKeys = new java.util.HashSet(Tables.splitLayout.keySet())
    try {
      Tables.ensureSplitLayout(spark, sfDir)
      // big single-row-group tables got a copy...
      assert(Tables.splitLayout.containsKey(s"$sfDir/lineitem.parquet"))
      assert(Tables.splitLayout.containsKey(s"$sfDir/events.parquet"))
      // ...small ones did not (scatter still covers their compute)
      assert(!Tables.splitLayout.containsKey(s"$sfDir/region.parquet"))
      assert(!Tables.splitLayout.containsKey(s"$sfDir/documents.parquet"))
      val liCopy = spark.read.parquet(
        Tables.splitLayout.get(s"$sfDir/lineitem.parquet"))
      assert(liCopy.rdd.getNumPartitions > 1, "copy must be multi-split")
      assert(signature(liCopy) == before("lineitem"),
        "lineitem copy must be row-identical to the original")
      val evCopy = spark.read.parquet(
        Tables.splitLayout.get(s"$sfDir/events.parquet"))
      assert(signature(evCopy) == before("events"),
        "events copy must be row-identical (incl. the ts encoding)")
      // re-ensure is idempotent (no second rewrite of the same source)
      Tables.ensureSplitLayout(spark, sfDir)
    } finally {
      // restore: later specs in this JVM read the pristine originals
      val it = Tables.splitLayout.keySet().iterator()
      while (it.hasNext) {
        val k = it.next()
        if (!savedKeys.contains(k)) {
          Tables.invalidate(spark, k)
          it.remove()
        }
      }
    }
  }
}
