package graft.streaming

import java.nio.file.Files
import java.security.MessageDigest

import graft.{Tables, TestSpark}
import graft.functions.KmvAgg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The standing KMV fold: after EVERY micro-batch the sketch must be
  * bit-identical to a one-shot aggregate over the concatenated prefix
  * (KMV is a pure set function — the strongest standing-fold guarantee
  * in the suite), and the durable snapshot must survive kill/restart
  * and forged redelivery like the heavy-hitter stage. */
class StreamingDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def h48(w: String): Long =
    java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12), 16)

  /** Streams BIGRAMS, not tokens: the fixture vocabulary at sf0.001 is
    * only 31 words (the sketch would never fill), but 916 bigrams —
    * enough to exercise the full-sketch estimate regime. */
  private def tokenChunks(parts: Int): Seq[Seq[String]] = {
    val toks = Tables.documents(spark, sfDir)
      .orderBy(col("doc_id"))
      .select(col("text")).collect()
      .flatMap { r =>
        val tk = r.getString(0).split(" ").filter(_.nonEmpty)
        tk.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      }.toSeq
    toks.grouped(math.max(1, toks.length / parts + 1)).toSeq
  }

  private def localSketch(ws: Seq[String]): Vector[Long] =
    ws.map(h48).distinct.sorted.take(KmvAgg.K).toVector

  test("standing sketch equals the one-shot sketch after every batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val chunks = tokenChunks(4)
    assert(chunks.length >= 3)
    val state = new IncrementalDistinct.State
    val src = MemoryStream[String]
    val q = IncrementalDistinct.start(src.toDF().toDF("w"), state,
      Files.createTempDirectory("kmv-ck").toString, _ => ())
    try {
      var seen = Vector.empty[String]
      chunks.foreach { c =>
        src.addData(c)
        q.processAllAvailable()
        seen = seen ++ c
        val snap = state.get
        assert(snap.n == seen.length.toLong, "running count must be exact")
        assert(snap.mins == localSketch(seen),
          s"sketch diverged from one-shot after ${seen.length} rows")
        // the estimate is the q105 formula over the sketch
        val exp =
          if (snap.mins.size < KmvAgg.K) snap.mins.size.toLong
          else (KmvAgg.K - 1).toLong * KmvAgg.Domain /
            snap.mins(KmvAgg.K - 1)
        assert(snap.estimate == exp)
      }
      // on the fixture the sketch is full and the estimate lands within
      // the K=64 concentration band of the true distinct count
      val truth = seen.map(h48).distinct.size.toLong
      assert(state.get.mins.size == KmvAgg.K)
      val err = math.abs(state.get.estimate - truth).toDouble / truth
      assert(err < 0.5, s"estimate ${state.get.estimate} vs $truth")
    } finally q.stop()
  }

  private def feed(src: MemoryStream[String],
      state: IncrementalDistinct.State, ckpt: String,
      chunks: Seq[Seq[String]]) = {
    val q = IncrementalDistinct.start(src.toDF().toDF("w"), state, ckpt,
      _ => ())
    chunks.foreach { c => src.addData(c); q.processAllAvailable() }
    q
  }

  test("kill/restart restores the durable sketch — parity with unbroken run") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val chunks = tokenChunks(4)

    val stateA = new IncrementalDistinct.State
    val qA = feed(MemoryStream[String], stateA,
      Files.createTempDirectory("kmv-unbroken").toString, chunks)
    qA.stop()
    val finalA = stateA.get

    val ckpt = Files.createTempDirectory("kmv-restart").toString
    val src = MemoryStream[String]
    val q1 = feed(src, new IncrementalDistinct.State, ckpt, chunks.take(2))
    q1.stop()
    val stateB = new IncrementalDistinct.State
    assert(stateB.get.n == 0L, "fresh state starts empty, like a new JVM")
    val q2 = feed(src, stateB, ckpt, chunks.drop(2))
    try {
      assert(stateB.get.n == finalA.n)
      assert(stateB.get.mins == finalA.mins)
      assert(stateB.get.estimate == finalA.estimate)
    } finally q2.stop()
  }

  test("redelivered batch is skipped, not double-counted") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val chunks = tokenChunks(4).take(2)
    val ckpt = Files.createTempDirectory("kmv-replay").toString
    val src = MemoryStream[String]
    val q1 = feed(src, new IncrementalDistinct.State, ckpt, chunks)
    q1.stop()

    // forge an at-least-once redelivery: drop batch 1's commit marker
    val lastCommit = java.nio.file.Paths.get(ckpt, "commits", "1")
    assert(Files.exists(lastCommit))
    Files.delete(lastCommit)
    Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))

    val state2 = new IncrementalDistinct.State
    val q2 = IncrementalDistinct.start(src.toDF().toDF("w"), state2, ckpt,
      _ => ())
    try {
      q2.processAllAvailable()
      val total = chunks.map(_.length.toLong).sum
      assert(state2.get.n == total,
        s"replayed batch double-counted: n=${state2.get.n}, want $total")
      assert(state2.get.lastBatch == 1L)
      // n aside, the SKETCH is double-merge-immune by construction (set
      // semantics) — this pins the n/lastBatch guard specifically
    } finally q2.stop()
  }

  test("sketch persist/load round-trips atomically") {
    val dir = Files.createTempDirectory("kmv-io")
    val file = dir.resolve("sketch")
    assert(IncrementalDistinct.load(file).isEmpty)
    val s = IncrementalDistinct.Summary(Vector(3L, 9L, 77L), 42L, 5L)
    IncrementalDistinct.persist(file, s)
    assert(IncrementalDistinct.load(file).contains(s))
    val s2 = IncrementalDistinct.Summary(Vector.empty, 50L, 6L)
    IncrementalDistinct.persist(file, s2)
    assert(IncrementalDistinct.load(file).contains(s2))
  }
}
