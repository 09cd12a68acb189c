package graft.streaming

import graft.TestSpark
import graft.ingest.Ingest
import graft.sources.mqtt.InMemoryBroker
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-mode stateful operators on the MQTT stream: keyed custom
  * state (flatMapGroupsWithState) and watermarked tumbling windows — the
  * batch twins are oracle-checked as q23/q24; these prove the same
  * expressions run incrementally with state. */
class StatefulStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def stream(cid: String) = {
    InMemoryBroker.reset(cid)
    InMemoryBroker.setSubscriptions(cid, Seq("#"))
    IngestPipeline.mqttStream(spark, cid, Seq("#"))
  }

  test("flatMapGroupsWithState: running per-sensor stats across batches") {
    val cid = s"stats-${System.nanoTime()}"
    val name = s"t${cid.replace("-", "")}"
    val q = SensorStats.runningStats(Ingest.records(stream(cid)))
      .writeStream.format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      InMemoryBroker.publish("/c/d/out/sensors/temp", """{"value":10.0}""")
      InMemoryBroker.publish("/c/d/out/sensors/temp", """{"value":20.0}""")
      q.processAllAvailable()
      // second batch: state must carry over (count continues at 3)
      InMemoryBroker.publish("/c/d2/out/sensors/temp", """{"value":60.0}""")
      q.processAllAvailable()
      val updates = spark.table(name)
        .orderBy(col("count")).collect()
        .map(r => (r.getAs[Long]("count"), r.getAs[Double]("mean"),
          r.getAs[Double]("min"), r.getAs[Double]("max")))
      assert(updates.last == ((3L, 30.0, 10.0, 60.0)))
      assert(updates.head == ((2L, 15.0, 10.0, 20.0)))
    } finally q.stop()
  }

  test("streaming session window with watermark (q24's streaming twin)") {
    val cid = s"sess-${System.nanoTime()}"
    val name = s"t${cid.replace("-", "")}"
    val src = stream(cid)
    // zero-delay watermark on the broker's 1ms-step logical clock
    // (session windows support only append mode on streams)
    val agg = Ingest.parse(src).filter(col("valid"))
      .withWatermark("receivedAt", "0 seconds")
      .groupBy(session_window(col("receivedAt"), "10 milliseconds"),
        col("tableName"))
      .agg(count(lit(1)).as("n"))
      .select(col("tableName"), col("n"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      // 3 messages 1ms apart → one session under the 10ms gap
      InMemoryBroker.publish("/c/d/out/sensors/s", """{"value":1}""")
      InMemoryBroker.publish("/c/d/out/sensors/s", """{"value":2}""")
      InMemoryBroker.publish("/c/d/out/sensors/s", """{"value":3}""")
      q.processAllAvailable()
      // append mode emits once the watermark passes the session end; the
      // watermark used by batch N comes from batch N-1's max event time,
      // so push it forward across two further batches
      (1 to 30).foreach { _ =>
        InMemoryBroker.publish("/c/d/out/sensors/later", """{"value":9}""")
      }
      q.processAllAvailable()
      InMemoryBroker.publish("/c/d/out/sensors/later", """{"value":9}""")
      q.processAllAvailable()
      val sess = spark.table(name).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      assert(sess.contains(("s", 3L)),
        s"expected closed session (s,3), got ${sess.toSeq}")
    } finally q.stop()
  }

  test("late data behind the watermark is dropped from windowed aggs") {
    val cid = s"late-${System.nanoTime()}"
    val name = s"t${cid.replace("-", "")}"
    val src = stream(cid)
    val agg = Ingest.parse(src).filter(col("valid"))
      .withWatermark("receivedAt", "10 milliseconds")
      .groupBy(window(col("receivedAt"), "1 second"), col("tableName"))
      .agg(count(lit(1)).as("n"))
      .select(col("tableName"), col("n"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      InMemoryBroker.publish("/c/d/out/sensors/lt", """{"value":1}""")
      q.processAllAvailable()
      // advance event time well past the late event's window + delay
      (1 to 30).foreach { _ =>
        InMemoryBroker.publish("/c/d/out/sensors/other", """{"value":2}""")
      }
      q.processAllAvailable()
      // now inject an event 10 SECONDS behind current event time — far
      // behind the 10ms watermark delay → state for its window is gone
      InMemoryBroker.publishAt("/c/d/out/sensors/lt", """{"value":3}""",
        InMemoryBroker.now() - 10000000L)
      q.processAllAvailable()
      val ltCounts = spark.table(name)
        .filter(col("tableName") === "lt")
        .select(col("n")).collect().map(_.getLong(0)).toSeq
      // if the late event were accepted it would emit its own (lt, 1)
      // window update → a second row; watermark-dropped means exactly one
      assert(ltCounts == Seq(1L),
        s"late event must be dropped entirely, got $ltCounts")
    } finally q.stop()
  }

  test("stream-stream interval join with watermarks on both sides") {
    // readings and alerts are two independent MQTT streams; an alert
    // enriches the latest reading of the SAME device when it arrives
    // within 100ms — the canonical watermarked stream-stream equi+range
    // join (state on both sides, bounded by the watermarks)
    val rc = s"ssr-${System.nanoTime()}"
    val ac = s"ssa-${System.nanoTime()}"
    val name = s"t${rc.replace("-", "")}"
    val readings = Ingest.parse(stream(rc)).filter(col("valid"))
      .filter(col("client") === "r")
      .select(col("device").as("r_dev"), col("receivedAt").as("r_ts"))
      .withWatermark("r_ts", "1 second")
    val alerts = Ingest.parse(stream(ac)).filter(col("valid"))
      .filter(col("client") === "a")
      .select(col("device").as("a_dev"), col("receivedAt").as("a_ts"))
      .withWatermark("a_ts", "1 second")
    val joined = readings.join(alerts, expr(
      """r_dev = a_dev AND
        |a_ts >= r_ts AND a_ts <= r_ts + interval 100 milliseconds"""
        .stripMargin))
      .select(col("r_dev"))
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      InMemoryBroker.publish("/r/d1/out/sensors/temp", """{"value":1.0}""")
      InMemoryBroker.publish("/a/d1/out/sensors/alert", """{"value":9.0}""")
      InMemoryBroker.publish("/a/d9/out/sensors/alert", """{"value":9.0}""")
      InMemoryBroker.publish("/r/d2/out/sensors/temp", """{"value":2.0}""")
      q.processAllAvailable()
      val got = spark.table(name).collect().map(_.getString(0)).toSeq
      assert(got == Seq("d1"),
        s"only d1 has a reading AND an in-window alert, got $got")
    } finally q.stop()
  }

  test("streaming tumbling window with watermark over receivedAt") {
    val cid = s"win-${System.nanoTime()}"
    val name = s"t${cid.replace("-", "")}"
    val src = stream(cid)
    val agg = Ingest.parse(src).filter(col("valid"))
      .withWatermark("receivedAt", "1 minute")
      .groupBy(window(col("receivedAt"), "1 minute"), col("tableName"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      InMemoryBroker.publish("/c/d/out/sensors/a", """{"value":1}""")
      InMemoryBroker.publish("/c/d/out/sensors/a", """{"value":2}""")
      InMemoryBroker.publish("/c/d/out/sensors/b", """{"value":3}""")
      q.processAllAvailable()
      val rows = spark.table(name)
        .select(col("tableName"), col("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == Map("a" -> 2L, "b" -> 1L))
    } finally q.stop()
  }
}
