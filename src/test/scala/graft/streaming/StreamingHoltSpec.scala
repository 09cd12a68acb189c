package graft.streaming

import graft.{SparkEntry, TestSpark}
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch/stream parity for the Holt smoother: the REAL fixture's
  * hourly series, delivered hour-ordered across three micro-batches
  * through [[HoltState]], must land on exactly the registers the batch
  * fold (q156) computes — level, trend, forecast, and point count,
  * bit-for-bit, for every event type. */
class StreamingHoltSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("streamed registers equal the batch q156 fold bit-for-bit") {
    import spark.implicits._
    val points = graft.Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000L").as("hr"))
      .groupBy(col("event_type"), col("hr")).count()
      .collect()
      .map(r => HoltState.HoltPoint(r.getString(0), r.getLong(1),
        r.getLong(2)))
      .sortBy(_.hr)
    assert(points.nonEmpty)
    val chunks = points.grouped(math.max(1, points.length / 3 + 1)).toSeq

    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[HoltState.HoltPoint]
    val name = s"holt${System.nanoTime()}"
    val q = HoltState.run(src.toDS())
      .writeStream.format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    try {
      chunks.foreach { c => src.addData(c); q.processAllAvailable() }
      // last update per key is the final register set
      val got = spark.table(name)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type"))
            .orderBy(col("n_hours").desc)))
        .filter(col("rn") === 1)
        .collect()
        .map(r => r.getString(0) -> (r.getAs[Long]("n_hours"),
          r.getAs[Long]("level_micro"), r.getAs[Long]("trend_micro"),
          r.getAs[Long]("fc1_micro"))).toMap

      val batch = SparkEntry.queries("q156_holt_forecast")(spark, sfDir)
        .collect()
        .map(r => r.getString(0) -> (r.getAs[Long]("n_hours"),
          r.getAs[Long]("level_micro"), r.getAs[Long]("trend_micro"),
          r.getAs[Long]("fc1_micro"))).toMap
      assert(got == batch,
        s"stream registers ${got.size} keys != batch ${batch.size}")
    } finally q.stop()
  }
}
