package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact dedup with TTL'd state
  * (`dropDuplicatesWithinWatermark`): the ingestion-path companion to
  * the standing-index near-dup stream (StreamingDedupSpec). State is
  * bounded by the watermark delay — the property that makes streaming
  * dedup viable at 100 TB/day: a key's fingerprint lives only while a
  * duplicate could still legally arrive, then the store evicts it. The
  * flip side is pinned too: a re-arrival AFTER eviction is treated as
  * new — TTL dedup trades unbounded state for at-least-once distinct
  * semantics, and downstream idempotency (the MERGE path, q98) owns
  * the rest. */
class WatermarkDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("duplicates within the watermark drop; state evicts past it") {
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, Timestamp)]
    val q = src.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("id")
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("wmck").toString)
      .format("memory").queryName("wm_dedup").outputMode("append")
      .start()
    try {
      def seen(): Seq[(Long, Timestamp)] =
        spark.table("wm_dedup").collect()
          .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq

      // batch 1: id 1 twice within the window → exactly one survives
      src.addData((1L, ts("2024-01-01 10:00:00")),
        (2L, ts("2024-01-01 10:00:01")),
        (1L, ts("2024-01-01 10:00:02")))
      q.processAllAvailable()
      assert(seen().map(_._1).sorted == Seq(1L, 2L),
        s"one row per id within the window, got ${seen()}")

      // batch 2: advance the watermark far past id 1's expiry
      // (event time + 10 s delay), so its fingerprint is evicted
      src.addData((3L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()

      // batch 3: id 1 re-arrives AFTER eviction → emitted again
      src.addData((1L, ts("2024-01-01 10:04:58")))
      q.processAllAvailable()
      val ids = seen().map(_._1).groupBy(identity).view.mapValues(_.size).toMap
      assert(ids(1L) == 2,
        s"id 1 must re-emit after its dedup state expired, got ${seen()}")
      assert(ids(2L) == 1 && ids(3L) == 1)
    } finally q.stop()
  }
}
