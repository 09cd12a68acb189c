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

  test("index refresh between micro-batches: no missed, no duplicate flags") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    // corpus generation A: the q120 "old" split; generation B simulates a
    // compaction — half of A's docs dropped, the former stream docs folded
    // in (so post-swap probes must flag against B's members and must NOT
    // flag against the dropped half)
    val corpusA = docs.filter(col("doc_id") % 10 =!= 7)
    val corpusB = docs.filter(col("doc_id") % 10 =!= 7 &&
      col("doc_id") % 4 =!= 1)
    val newDocs = docs.filter(col("doc_id") % 10 === 7)
      .as[(Long, String)].collect().sortBy(_._1)
    val chunks = newDocs.grouped(math.max(1, newDocs.length / 4 + 1)).toSeq
    assert(chunks.length >= 3, "need batches on both sides of the swap")
    val swapAt = chunks.length / 2 // refresh fires after this many batches

    // expected = per-batch batch-mode flags against the index generation
    // that batch's boundary resolves — built with the SAME flag()
    // pipeline, so equality is exact
    val refA = IncrementalDedup.buildIndex(corpusA)
    val refB = IncrementalDedup.buildIndex(corpusB)
    val expected = chunks.zipWithIndex.flatMap { case (c, i) =>
      val idx = if (i < swapAt) refA else refB
      IncrementalDedup.flag(c.toSeq.toDF("doc_id", "text"), idx)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }
    assert(expected.nonEmpty)
    assert(expected.size == expected.toSet.size,
      "reference run itself must not duplicate flags")
    // the swap must be OBSERVABLE: at least one pair whose old_doc exists
    // only pre-swap (dropped by compaction) or flags only against B
    val dropped = corpusA.select(col("doc_id")).except(
      corpusB.select(col("doc_id"))).as[Long].collect().toSet
    assert(expected.exists { case (_, old, _) => dropped.contains(old) } ||
      chunks.zipWithIndex.drop(swapAt).exists { case (c, _) =>
        IncrementalDedup.flag(c.toSeq.toDF("doc_id", "text"), refA)
          .collect().exists(r => dropped.contains(r.getLong(1)))
      }, "fixture must make the A/B index difference visible")

    val live = new IncrementalDedup.StandingIndexRef(
      IncrementalDedup.buildIndex(corpusA))
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double)]
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, String)]
    val q = IncrementalDedup.start(
      src.toDF().toDF("doc_id", "text"), live,
      Files.createTempDirectory("incdedup-swap-ck").toString,
      flags => {
        val rows = flags.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        got.synchronized { got ++= rows }
        ()
      })
    try {
      chunks.zipWithIndex.foreach { case (c, i) =>
        if (i == swapAt) live.refresh(corpusB)
        src.addData(c.toSeq)
        q.processAllAvailable()
      }
      val g = got.synchronized(got.toList)
      assert(g.size == g.toSet.size, "no flag may duplicate across the swap")
      assert(g.toSet == expected.toSet,
        s"swap divergence: stream-only=${g.toSet -- expected.toSet} " +
          s"batch-only=${expected.toSet -- g.toSet}")
    } finally {
      q.stop()
      live.release()
      refA.release()
      refB.release()
    }
  }

  test("restart mid-generation: replayed batches skipped, resumed batches probe the new index") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val corpusA = docs.filter(col("doc_id") % 10 =!= 7)
    val corpusB = docs.filter(col("doc_id") % 10 =!= 7 &&
      col("doc_id") % 4 =!= 1)
    val newDocs = docs.filter(col("doc_id") % 10 === 7)
      .as[(Long, String)].collect().sortBy(_._1)
    // 8 batches: fine enough that some NON-FINAL batch's flags differ
    // between generations (the killAfter search below needs one)
    val chunks = newDocs.grouped(math.max(1, newDocs.length / 8 + 1)).toSeq
    assert(chunks.length >= 3, "need batches on both sides of the restart")

    val refA = IncrementalDedup.buildIndex(corpusA)
    val refB = IncrementalDedup.buildIndex(corpusB)
    def flagsOf(c: Seq[(Long, String)], idx: IncrementalDedup.StandingIndex) =
      IncrementalDedup.flag(c.toDF("doc_id", "text"), idx)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    // kill AFTER the first batch whose A-flags and B-flags differ, so
    // the forged replay of that batch is observable: re-probing it
    // against B (wrong) or delivering it twice (wrong) both diverge
    // from skipping it (right). It must not be the last batch — we need
    // ≥1 genuinely resumed batch after the restart.
    val killAfter = (0 until chunks.length - 1).find { i =>
      flagsOf(chunks(i).toSeq, refA) != flagsOf(chunks(i).toSeq, refB)
    }.getOrElse(fail(
      "fixture must make replay-generation confusion observable"))

    // expected: batches 0..killAfter flagged against generation A
    // (delivered before the kill), later batches against generation B
    // (the corpus as the restarted process finds it) — and the killAfter
    // batch, though REPLAYED by the checkpoint after we forge a missing
    // commit marker, contributes exactly its pre-restart A-flags, once
    val expected = chunks.zipWithIndex.flatMap { case (c, i) =>
      flagsOf(c.toSeq, if (i <= killAfter) refA else refB)
    }
    assert(expected.size == expected.toSet.size)

    val ckpt = Files.createTempDirectory("incdedup-restart-ck").toString
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Double)]
    val sink: org.apache.spark.sql.DataFrame => Unit = flags => {
      val rows = flags.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      got.synchronized { got ++= rows }
      ()
    }
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, String)]

    // run 1: generation A up to and including the killAfter batch
    val live1 = new IncrementalDedup.StandingIndexRef(
      IncrementalDedup.buildIndex(corpusA))
    val q1 = IncrementalDedup.start(
      src.toDF().toDF("doc_id", "text"), live1, ckpt, sink)
    chunks.take(killAfter + 1).foreach { c =>
      src.addData(c.toSeq); q1.processAllAvailable()
    }
    q1.stop()
    live1.release()

    // forge an at-least-once redelivery of the last delivered batch
    Files.delete(java.nio.file.Paths.get(
      ckpt, "commits", killAfter.toString))
    Files.deleteIfExists(java.nio.file.Paths.get(
      ckpt, "commits", s".$killAfter.crc"))

    // run 2: the restarted process rebuilds from the compacted corpus (B)
    val live2 = new IncrementalDedup.StandingIndexRef(
      IncrementalDedup.buildIndex(corpusB))
    val q2 = IncrementalDedup.start(
      src.toDF().toDF("doc_id", "text"), live2, ckpt, sink)
    try {
      chunks.drop(killAfter + 1).foreach { c =>
        src.addData(c.toSeq); q2.processAllAvailable()
      }
      val g = got.synchronized(got.toList)
      assert(g.size == g.toSet.size,
        "replayed batch must not duplicate flags")
      assert(g.toSet == expected.toSet,
        s"restart divergence: stream-only=${g.toSet -- expected.toSet} " +
          s"batch-only=${expected.toSet -- g.toSet}")
    } finally {
      q2.stop()
      live2.release()
      refA.release()
      refB.release()
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
