package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.functions.{CountMinAgg, KmvAgg, MinHashSig}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The mergeable sketch Aggregators (count-min q81, KMV q105) running as
  * STREAMING aggregations: because their buffers merge associatively,
  * Spark can fold them incrementally in update mode — the sketch over
  * the stream prefix must equal the batch sketch over the same rows.
  * This is the 100 TB streaming claim for the sketch family: per-batch
  * state is one bounded buffer per key, never the raw stream. */
class StreamingSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming KMV across batches equals the batch sketch") {
    val kmv = udaf(KmvAgg)
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Long]
    val name = s"kmvstream${System.nanoTime()}"
    val q = mem.toDF().toDF("h")
      .agg(kmv(col("h")).as("sk"))
      .writeStream.format("memory").queryName(name).outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    val rnd = new scala.util.Random(5)
    val batch1 = Seq.fill(5000)(rnd.nextLong(1L << 48))
    val batch2 = Seq.fill(5000)(rnd.nextLong(1L << 48))
    try {
      mem.addData(batch1)
      q.processAllAvailable()
      mem.addData(batch2)
      q.processAllAvailable()
      val streamed = spark.table(name).as[Seq[Long]].head()
      val batch = (batch1 ++ batch2).toDF("h")
        .agg(kmv(col("h"))).as[Seq[Long]].head()
      assert(streamed == batch,
        "incremental sketch state must equal the one-shot sketch")
      assert(streamed == (batch1 ++ batch2).distinct.sorted.take(KmvAgg.K))
    } finally q.stop()
  }

  test("streaming per-key count-min across batches equals batch sketches") {
    val cms = udaf(CountMinAgg)
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val name = s"cmsstream${System.nanoTime()}"
    val q = mem.toDF().toDF("lang", "token")
      .groupBy(col("lang"))
      .agg(cms(col("token")).as("sk"))
      .writeStream.format("memory").queryName(name).outputMode("complete")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    val rnd = new scala.util.Random(9)
    def mk(n: Int) = Seq.fill(n)(
      (s"l${rnd.nextInt(3)}", s"t${rnd.nextInt(50)}"))
    val b1 = mk(2000)
    val b2 = mk(2000)
    try {
      mem.addData(b1)
      q.processAllAvailable()
      mem.addData(b2)
      q.processAllAvailable()
      val streamed = spark.table(name)
        .select(col("lang"), col("sk")).as[(String, Seq[Long])]
        .collect().toMap
      val batch = (b1 ++ b2).toDF("lang", "token")
        .groupBy(col("lang")).agg(cms(col("token")).as("sk"))
        .select(col("lang"), col("sk")).as[(String, Seq[Long])]
        .collect().toMap
      assert(streamed == batch)
      // soundness carries over: estimates dominate true counts
      val exact = (b1 ++ b2).groupBy(identity).view.mapValues(_.size)
      exact.foreach { case ((lang, tok), c) =>
        val h = MinHashSig.hash20(tok.getBytes("UTF-8"))
        val est = (0 until CountMinAgg.D).map { i =>
          val b = (((MinHashSig.A(i) * h + MinHashSig.B(i)) % MinHashSig.P)
            % CountMinAgg.W).toInt
          streamed(lang)(i * CountMinAgg.W + b)
        }.min
        assert(est >= c)
      }
    } finally q.stop()
  }
}
