package graft.streaming

import java.nio.file.Files
import java.security.MessageDigest

import graft.{Tables, TestSpark}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The standing drift fold: after EVERY micro-batch the hashed bucket
  * counts must equal a one-shot aggregate over the concatenated prefix
  * (bucket counts are a pure additive function of the multiset — exact,
  * merge-order-free), the TV ppm must equal an independently computed
  * rational TV over the same buckets, and the durable snapshot must
  * survive kill/restart and forged redelivery like the other standing
  * stages. */
class StreamingDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** The q126 bucket contract, reimplemented independently of the SQL
    * expression under test. */
  private def bucket(w: String): Long =
    java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8), 16) % IncrementalDrift.Buckets

  private def allTokens: Seq[String] =
    Tables.documents(spark, sfDir)
      .orderBy(col("doc_id"))
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty)).toSeq

  private def chunksOf(parts: Int): Seq[Seq[String]] = {
    val toks = allTokens
    toks.grouped(math.max(1, toks.length / parts + 1)).toSeq
  }

  private def localCounts(ws: Seq[String]): Map[Long, Long] =
    ws.groupBy(bucket).map { case (b, g) => b -> g.length.toLong }

  /** Independent rational TV replay in BigInt (the q177 form, with
    * q180's GREATEST(2·t·tr, 1) denominator guard — the degenerate-
    * input convention both twins share). */
  private def localTvPpm(cur: Map[Long, Long], n: Long,
      ref: Map[Long, Long], refT: Long): Long = {
    val t = BigInt(n); val tr = BigInt(refT)
    val num = (cur.keySet ++ ref.keySet).iterator.map { b =>
      (BigInt(cur.getOrElse(b, 0L)) * tr -
        BigInt(ref.getOrElse(b, 0L)) * t).abs
    }.sum
    ((num * 1000000) / ((2 * t * tr) max BigInt(1))).toLong
  }

  /** Reference = the first half of the corpus (a frozen "training
    * snapshot"); the stream replays the whole corpus, so drift starts
    * high on the second-half batches and the final TV is the
    * whole-vs-half distance. */
  private def refHalf: (IncrementalDrift.Reference, Map[Long, Long], Long) = {
    import spark.implicits._
    val half = allTokens.take(allTokens.length / 2)
    val ref = IncrementalDrift.referenceOf(half.toDF("w"))
    (ref, localCounts(half), half.length.toLong)
  }

  test("standing counts and TV equal one-shot recomputes after every batch") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val chunks = chunksOf(4)
    assert(chunks.length >= 3)
    val (ref, refCounts, refT) = refHalf
    // referenceOf itself must agree with the independent replay
    assert(ref.counts == refCounts && ref.total == refT)
    val state = new IncrementalDrift.State
    val src = MemoryStream[String]
    var lastTv = -1L
    val q = IncrementalDrift.start(src.toDF().toDF("w"), ref, state,
      Files.createTempDirectory("drift-ck").toString,
      (_, tv) => lastTv = tv)
    try {
      var seen = Vector.empty[String]
      chunks.foreach { c =>
        src.addData(c)
        q.processAllAvailable()
        seen = seen ++ c
        val snap = state.get
        assert(snap.n == seen.length.toLong, "running count must be exact")
        assert(snap.counts == localCounts(seen),
          s"counts diverged from one-shot after ${seen.length} rows")
        assert(snap.tvPpm(ref) ==
          localTvPpm(localCounts(seen), seen.length.toLong, refCounts, refT))
        assert(lastTv == snap.tvPpm(ref), "onUpdate must carry the same TV")
      }
      // the full corpus vs its own first half: drifted but far from
      // disjoint — TV strictly between 0 and 1
      assert(lastTv > 0L && lastTv < 1000000L, s"tv=$lastTv")
    } finally q.stop()
  }

  private def feed(src: MemoryStream[String], ref: IncrementalDrift.Reference,
      state: IncrementalDrift.State, ckpt: String,
      chunks: Seq[Seq[String]]) = {
    val q = IncrementalDrift.start(src.toDF().toDF("w"), ref, state, ckpt,
      (_, _) => ())
    chunks.foreach { c => src.addData(c); q.processAllAvailable() }
    q
  }

  test("kill/restart restores the durable counts — parity with unbroken run") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val chunks = chunksOf(4)
    val (ref, _, _) = refHalf

    val stateA = new IncrementalDrift.State
    val qA = feed(MemoryStream[String], ref, stateA,
      Files.createTempDirectory("drift-unbroken").toString, chunks)
    qA.stop()
    val finalA = stateA.get

    val ckpt = Files.createTempDirectory("drift-restart").toString
    val src = MemoryStream[String]
    val q1 = feed(src, ref, new IncrementalDrift.State, ckpt, chunks.take(2))
    q1.stop()
    val stateB = new IncrementalDrift.State
    assert(stateB.get.n == 0L, "fresh state starts empty, like a new JVM")
    val q2 = feed(src, ref, stateB, ckpt, chunks.drop(2))
    try {
      assert(stateB.get.n == finalA.n)
      assert(stateB.get.counts == finalA.counts)
      assert(stateB.get.tvPpm(ref) == finalA.tvPpm(ref))
    } finally q2.stop()
  }

  test("redelivered batch is skipped, not double-counted") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val chunks = chunksOf(4).take(2)
    val (ref, refCounts, refT) = refHalf
    val ckpt = Files.createTempDirectory("drift-replay").toString
    val src = MemoryStream[String]
    val q1 = feed(src, ref, new IncrementalDrift.State, ckpt, chunks)
    q1.stop()

    // forge an at-least-once redelivery: drop batch 1's commit marker
    val lastCommit = java.nio.file.Paths.get(ckpt, "commits", "1")
    assert(Files.exists(lastCommit))
    Files.delete(lastCommit)
    Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))

    val state2 = new IncrementalDrift.State
    val q2 = IncrementalDrift.start(src.toDF().toDF("w"), ref, state2, ckpt,
      (_, _) => ())
    try {
      q2.processAllAvailable()
      val seen = chunks.flatten
      assert(state2.get.n == seen.length.toLong,
        s"replayed batch double-counted: n=${state2.get.n}")
      assert(state2.get.lastBatch == 1L)
      assert(state2.get.counts == localCounts(seen),
        "a double merge would inflate bucket counts — counts must match " +
          "the one-shot recompute")
      assert(state2.get.tvPpm(ref) ==
        localTvPpm(localCounts(seen), seen.length.toLong, refCounts, refT))
    } finally q2.stop()
  }

  test("counts persist/load round-trips atomically") {
    val dir = Files.createTempDirectory("drift-io")
    val file = dir.resolve("counts")
    assert(IncrementalDrift.load(file).isEmpty)
    val s = IncrementalDrift.Summary(Map(3L -> 7L, 9L -> 1L), 8L, 5L)
    IncrementalDrift.persist(file, s)
    assert(IncrementalDrift.load(file).contains(s))
    val s2 = IncrementalDrift.Summary(Map.empty, 50L, 6L)
    IncrementalDrift.persist(file, s2)
    assert(IncrementalDrift.load(file).contains(s2))
  }

  test("batch twin parity: q180's tv_ppm equals the standing fold's") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // q180's exact setup: reference = the even-doc_id half, current =
    // the whole corpus — streamed here in 4 micro-batches
    val docs = Tables.documents(spark, sfDir).orderBy(col("doc_id"))
      .select(col("doc_id"), col("text")).collect()
    def toks(rows: Array[org.apache.spark.sql.Row]) =
      rows.flatMap(_.getString(1).split(" ").filter(_.nonEmpty)).toSeq
    val ref = IncrementalDrift.referenceOf(
      toks(docs.filter(_.getLong(0) % 2 == 0)).toDF("w"))
    val all = toks(docs)
    val state = new IncrementalDrift.State
    val src = MemoryStream[String]
    val q = IncrementalDrift.start(src.toDF().toDF("w"), ref, state,
      Files.createTempDirectory("drift-twin").toString, (_, _) => ())
    try {
      all.grouped(all.length / 4 + 1)
        .foreach { c => src.addData(c); q.processAllAvailable() }
      val batch = graft.SparkEntry
        .queries("q180_hashed_drift")(spark, sfDir)
      assert(batch.select(col("tv_ppm")).head().getLong(0) ==
        state.get.tvPpm(ref),
        "batch twin and standing fold must print the same drift")
    } finally q.stop()
  }

  test("TV edge cases: empty halves match q180's convention; disjoint → 1") {
    val ref = IncrementalDrift.Reference(Map(1L -> 5L, 2L -> 5L), 10L)
    // Degenerate halves follow the batch twin's GREATEST(2*t*tr, 1)
    // guard: numerator terms all carry a factor of the empty half's
    // total, so the ppm reads 0 in BOTH the stage and q180 (r10 ADVICE:
    // the stage used to print 10⁶ here while the twin printed 0).
    assert(IncrementalDrift.Summary(Map.empty, 0L).tvPpm(ref) == 0L)
    assert(IncrementalDrift.Summary(Map(1L -> 3L), 3L)
      .tvPpm(IncrementalDrift.Reference(Map.empty, 0L)) == 0L)
    assert(localTvPpm(Map.empty, 0L, ref.counts, ref.total) == 0L)
    // identical shape at a different scale → TV 0 (distribution, not mass)
    assert(IncrementalDrift.Summary(Map(1L -> 10L, 2L -> 10L), 20L)
      .tvPpm(ref) == 0L)
    // fully disjoint support → TV 1
    assert(IncrementalDrift.Summary(Map(7L -> 4L), 4L)
      .tvPpm(ref) == 1000000L)
  }

  test("reference freezes at first start: a restart offering a DIFFERENT " +
      "reference keeps the original") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val chunks = chunksOf(4)
    val (refA, _, _) = refHalf
    // a genuinely different reference: the SECOND half of the corpus
    val otherHalf = allTokens.drop(allTokens.length / 2)
    val refB = IncrementalDrift.referenceOf(otherHalf.toDF("w"))
    assert(refA != refB, "fixture halves must differ for this test to bite")

    val ckpt = Files.createTempDirectory("drift-frozen-ref").toString
    val src = MemoryStream[String]
    val q1 = feed(src, refA, new IncrementalDrift.State, ckpt, chunks.take(2))
    q1.stop()
    // the frozen reference must be durable beside the summary snapshot
    assert(Files.exists(java.nio.file.Paths.get(
      ckpt, "graft-drift-state", "reference")))

    // restart: the caller recomputed its reference against a MOVED
    // corpus (here: the other half) — the stage must keep refA, or the
    // TV series silently changes meaning mid-stream
    val state2 = new IncrementalDrift.State
    var lastTv = -1L
    val q2 = IncrementalDrift.start(src.toDF().toDF("w"), refB, state2, ckpt,
      (_, tv) => lastTv = tv)
    try {
      chunks.drop(2).foreach { c => src.addData(c); q2.processAllAvailable() }
      val snap = state2.get
      assert(lastTv == snap.tvPpm(refA),
        "reported TV must be against the FROZEN first-start reference")
      assert(snap.tvPpm(refA) != snap.tvPpm(refB),
        "the two references must disagree on this stream for the " +
          "assertion above to discriminate")
    } finally q2.stop()
  }
  test("corrupt frozen-reference file fails with the file path and the " +
      "re-baseline contract, not a bare NumberFormatException") {
    val dir = Files.createTempDirectory("drift-corrupt-ref")
    val f = dir.resolve("reference")
    // a hand-edit / non-atomic copy: header is not a number
    Files.write(f, "garbage header\n12 x\n".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      IncrementalDrift.loadRef(f)
    }
    assert(e.getMessage.contains(f.toString),
      "error must name the unreadable file")
    assert(e.getMessage.toLowerCase.contains("delete the checkpoint"),
      "error must state the re-baseline contract")
    // absent file is still cleanly absent, not an error
    assert(IncrementalDrift.loadRef(dir.resolve("nope")).isEmpty)
  }
}
