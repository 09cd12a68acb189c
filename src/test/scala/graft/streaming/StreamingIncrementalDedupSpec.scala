package graft.streaming

import java.nio.file.Files

import graft.{SparkEntry, TestSpark}
import graft.sources.mqtt.InMemoryBroker
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Batch-vs-stream PARITY of the incremental near-dup probe: the fixture
  * corpus's "new" documents (doc_id % 10 == 7, the q120 split) arrive as
  * a stream in several micro-batches, each probed against the standing
  * index of the "old" corpus — the union of per-batch flags must equal
  * the batch q120 result row-for-row, jaccard included (batch and stream
  * share the signature and verification pipelines, so equality is exact,
  * not approximate). Plus the MQTT composition: documents published as
  * JSON payloads ride the reference's source into the same probe. */
class StreamingIncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("stream flags across 4 micro-batches equal the batch q120 result") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val idx = IncrementalDedup.buildIndex(
      docs.filter(col("doc_id") % 10 =!= 7))
    val expected = SparkEntry.queries("q120_incremental_dedup")(
        spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty, "fixture must contain incremental near-dups")

    val newDocs = docs.filter(col("doc_id") % 10 === 7)
      .as[(Long, String)].collect().sortBy(_._1)
    // ≥3 micro-batches: a sustained standing index must catch near-dups
    // in WHICHEVER batch they arrive
    val chunks = newDocs.grouped(math.max(1, newDocs.length / 4 + 1)).toSeq
    assert(chunks.length >= 3)

    val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val q = IncrementalDedup.start(
      src.toDF().toDF("doc_id", "text"), idx,
      Files.createTempDirectory("incdedup-ck").toString,
      flags => {
        val rows = flags.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        got.synchronized { got ++= rows }
        ()
      })
    try {
      chunks.foreach { c =>
        src.addData(c.toSeq)
        q.processAllAvailable()
      }
      assert(got.synchronized(got.toSet) == expected,
        s"stream/batch divergence: stream-only=${got.toSet -- expected} " +
          s"batch-only=${expected -- got.toSet}")
    } finally {
      q.stop()
      idx.release()
    }
  }

  test("documents published over MQTT feed the same standing probe") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 4
    val corpus = Seq(
      (1L, base + "alpha beta gamma delta"),
      (2L, "completely different text about spark catalyst and tungsten " * 5))
      .toDF("doc_id", "text")
    val idx = IncrementalDedup.buildIndex(corpus)
    val cid = s"incdedup-${System.nanoTime()}"
    InMemoryBroker.reset(cid)
    val payloadSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val got = scala.collection.mutable.Set.empty[(Long, Long)]
    val q = IncrementalDedup.start(
      IngestPipeline.mqttStream(spark, cid, Seq("#"))
        .select(from_json(col("payload"), payloadSchema).as("d"))
        .select(col("d.doc_id").as("doc_id"), col("d.text").as("text")),
      idx,
      Files.createTempDirectory("incdedup-mqtt-ck").toString,
      flags => {
        val rows = flags.collect().map(r => (r.getLong(0), r.getLong(1)))
        got.synchronized { got ++= rows }
        ()
      })
    def pub(id: Long, text: String): Unit = {
      InMemoryBroker.publish("/corp/docs/out/sensors/doc",
        s"""{"doc_id":$id,"text":"$text"}""")
      ()
    }
    try {
      // batch 1: near-dup of corpus doc 1; batch 2: clean; batch 3:
      // exact dup of corpus doc 2
      pub(100L, base + "alpha beta gamma DELTA")
      q.processAllAvailable()
      pub(200L, "nothing like anything in the corpus at all " * 6)
      q.processAllAvailable()
      pub(300L, "completely different text about spark catalyst and tungsten " * 5)
      q.processAllAvailable()
      assert(got.synchronized(got.toSet) == Set((100L, 1L), (300L, 2L)),
        s"got $got")
    } finally {
      q.stop()
      idx.release()
    }
  }
}
