package graft.streaming

import java.nio.file.Files

import graft.{SparkEntry, Tables, TestSpark}
import graft.functions.MisraGriesAgg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The standing Misra–Gries fold against batch q166: the fixture's
  * events arrive in 4 micro-batches; after every batch the summary's
  * candidate set must contain every id that is heavy ON THE ROWS SEEN
  * SO FAR, and after the last batch the q166-style exact recount over
  * the candidates must equal batch q166's whole-corpus answer. */
class StreamingHeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("standing fold carries the superset guarantee across batches") {
    import spark.implicits._
    val users = Tables.eventsRaw(spark, sfDir)
      .select(col("event_id"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).map(_._2)
    val chunks = users.grouped(math.max(1, users.length / 4 + 1)).toSeq
    assert(chunks.length >= 3)

    val state = new IncrementalHeavyHitters.State
    val summaries =
      scala.collection.mutable.ArrayBuffer.empty[IncrementalHeavyHitters.Summary]
    implicit val sc = spark.sqlContext
    val src = MemoryStream[Long]
    val q = IncrementalHeavyHitters.start(
      src.toDF().toDF("user_id"), state,
      Files.createTempDirectory("hh-ck").toString,
      s => { summaries.synchronized { summaries += s }; () })
    try {
      var seen = Vector.empty[Long]
      chunks.foreach { c =>
        src.addData(c.toSeq)
        q.processAllAvailable()
        seen = seen ++ c
        val snap = state.get
        assert(snap.n == seen.length.toLong, "running count must be exact")
        // superset on the prefix: every currently-heavy id is a candidate
        val exactPrefix = seen.groupBy(identity)
          .collect { case (u, xs)
            if xs.length.toLong * MisraGriesAgg.K > seen.length => u }
          .toSet
        assert(exactPrefix.subsetOf(snap.buf.keySet),
          s"missing heavy ids after ${seen.length} rows")
        // undercount bound on kept counters
        snap.buf.foreach { case (u, est) =>
          val truth = seen.count(_ == u).toLong
          assert(est <= truth && truth - est <= snap.n / MisraGriesAgg.K)
        }
      }
      assert(summaries.synchronized(summaries.length) == chunks.length)
      // final recount over candidates == batch q166 on the same corpus
      val expected = SparkEntry.queries("q166_heavy_hitters")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val candSet = state.get.candidates.toSet
      val recount = seen.groupBy(identity)
        .collect { case (u, xs)
          if candSet(u) &&
            xs.length.toLong * MisraGriesAgg.K > seen.length =>
          u -> xs.length.toLong }
      assert(recount == expected,
        s"stream-only=${recount.toSet -- expected.toSet} " +
          s"batch-only=${expected.toSet -- recount.toSet}")
    } finally q.stop()
  }

  private def userChunks(parts: Int): Seq[Seq[Long]] = {
    val users = Tables.eventsRaw(spark, sfDir)
      .select(col("event_id"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).map(_._2)
    users.grouped(math.max(1, users.length / parts + 1)).toSeq.map(_.toSeq)
  }

  /** Feed `chunks` through a fresh query on (src, ckpt, state); returns
    * the query for the caller to stop. */
  private def feed(src: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long],
      state: IncrementalHeavyHitters.State, ckpt: String,
      chunks: Seq[Seq[Long]]) = {
    val q = IncrementalHeavyHitters.start(
      src.toDF().toDF("user_id"), state, ckpt, _ => ())
    chunks.foreach { c => src.addData(c); q.processAllAvailable() }
    q
  }

  test("kill/restart restores the durable summary — parity with unbroken run") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val chunks = userChunks(4)

    // unbroken reference run: all 4 chunks through one query
    val stateA = new IncrementalHeavyHitters.State
    val qA = feed(MemoryStream[Long], stateA,
      Files.createTempDirectory("hh-unbroken").toString, chunks)
    qA.stop()
    val finalA = stateA.get

    // broken run: same chunks, kill after 2, restart from the checkpoint
    // with a FRESH State (simulating a new JVM's empty memory)
    val ckpt = Files.createTempDirectory("hh-restart").toString
    val src = MemoryStream[Long]
    val q1 = feed(src, new IncrementalHeavyHitters.State, ckpt, chunks.take(2))
    q1.stop()
    val stateB = new IncrementalHeavyHitters.State
    assert(stateB.get.n == 0L, "fresh state starts empty, like a new JVM")
    val q2 = feed(src, stateB, ckpt, chunks.drop(2))
    try {
      val finalB = stateB.get
      assert(finalB.n == finalA.n,
        s"restart lost rows: ${finalB.n} vs unbroken ${finalA.n}")
      assert(finalB.buf == finalA.buf,
        "restart summary diverged from the unbroken run's")
    } finally q2.stop()
  }

  test("redelivered batch is skipped, not double-merged (idempotent)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val chunks = userChunks(4).take(2)
    val ckpt = Files.createTempDirectory("hh-replay").toString
    val src = MemoryStream[Long]
    val q1 = feed(src, new IncrementalHeavyHitters.State, ckpt, chunks)
    q1.stop()

    // forge an at-least-once redelivery: drop the last batch's commit
    // marker so the restarted query re-runs batch 1 from the checkpoint
    val lastCommit = java.nio.file.Paths.get(ckpt, "commits", "1")
    assert(Files.exists(lastCommit), "expected commit marker for batch 1")
    Files.delete(lastCommit)
    // drop the checksum sibling too, or the replayed commit can't rename
    Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))

    val state2 = new IncrementalHeavyHitters.State
    val q2 = IncrementalHeavyHitters.start(
      src.toDF().toDF("user_id"), state2, ckpt, _ => ())
    try {
      q2.processAllAvailable()
      val total = chunks.map(_.length.toLong).sum
      assert(state2.get.n == total,
        s"replayed batch was double-merged: n=${state2.get.n}, want $total")
      assert(state2.get.lastBatch == 1L)
    } finally q2.stop()
  }

  test("summary persist/load round-trips atomically") {
    val dir = Files.createTempDirectory("hh-io")
    val file = dir.resolve("summary")
    assert(IncrementalHeavyHitters.load(file).isEmpty)
    val s = IncrementalHeavyHitters.Summary(
      Map(7L -> 3L, -2L -> 9L, 0L -> 1L), 42L, 5L)
    IncrementalHeavyHitters.persist(file, s)
    assert(IncrementalHeavyHitters.load(file).contains(s))
    val s2 = IncrementalHeavyHitters.Summary(Map.empty, 50L, 6L)
    IncrementalHeavyHitters.persist(file, s2)
    assert(IncrementalHeavyHitters.load(file).contains(s2))
  }
}
