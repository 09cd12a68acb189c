package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream watermarked interval join ([[StreamJoin]]): the
  * impression→click attribution shape with BOTH sides unbounded. Inner
  * matches only clicks inside the lag window; left_outer additionally
  * emits "no click" rows once the watermark proves no match can still
  * arrive. */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("inner interval join matches only clicks within the lag window") {
    implicit val sc = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoin.intervalJoin(
      imps.toDF().toDF("ad", "its"),
      clicks.toDF().toDF("ad", "cts"),
      key = "ad", leftTs = "its", rightTs = "cts",
      maxLag = "30 seconds", watermark = "10 seconds")
    val q = joined.writeStream
      .option("checkpointLocation", Files.createTempDirectory("ssj").toString)
      .format("memory").queryName("ssj_inner").outputMode("append")
      .start()
    try {
      imps.addData((1L, ts("2024-01-01 10:00:00")), // clicked in window
        (2L, ts("2024-01-01 10:00:00")),            // clicked too late
        (3L, ts("2024-01-01 10:00:00")))            // never clicked
      clicks.addData((1L, ts("2024-01-01 10:00:20")),
        (2L, ts("2024-01-01 10:01:00")),
        (4L, ts("2024-01-01 10:00:05")))            // click w/o impression
      q.processAllAvailable()
      val rows = spark.table("ssj_inner").collect()
        .map(r => (r.getLong(0), r.getTimestamp(2))).toSeq
      assert(rows == Seq((1L, ts("2024-01-01 10:00:20"))),
        s"only ad 1's in-window click joins, got ${rows.toList}")
    } finally q.stop()
  }

  test("left_outer emits unmatched impressions after the window closes") {
    implicit val sc = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoin.intervalJoin(
      imps.toDF().toDF("ad", "its"),
      clicks.toDF().toDF("ad", "cts"),
      key = "ad", leftTs = "its", rightTs = "cts",
      maxLag = "30 seconds", watermark = "10 seconds",
      joinType = "left_outer")
    val q = joined.writeStream
      .option("checkpointLocation", Files.createTempDirectory("ssjo").toString)
      .format("memory").queryName("ssj_outer").outputMode("append")
      .start()
    try {
      imps.addData((1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:00:00")))
      clicks.addData((1L, ts("2024-01-01 10:00:10")))
      q.processAllAvailable()
      // advance BOTH watermarks far past 10:00:30 + 10s so ad 2's
      // match window is provably closed (watermark = max event - 10s)
      imps.addData((9L, ts("2024-01-01 10:10:00")))
      clicks.addData((9L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      // one more cycle so the outer-null emission lands in the sink
      imps.addData((8L, ts("2024-01-01 10:11:00")))
      clicks.addData((8L, ts("2024-01-01 10:11:00")))
      q.processAllAvailable()
      val byAd = spark.table("ssj_outer").collect()
        .map(r => (r.getLong(0), Option(r.getTimestamp(2)))).toMap
      assert(byAd(1L).contains(ts("2024-01-01 10:00:10")),
        s"matched click kept, got $byAd")
      assert(byAd.contains(2L) && byAd(2L).isEmpty,
        s"unmatched impression must emit with null click, got $byAd")
    } finally q.stop()
  }
}
