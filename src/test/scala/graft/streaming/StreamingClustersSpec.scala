package graft.streaming

import java.nio.file.Files

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-vs-stream parity of the standing CLUSTER maintenance: the q120
  * split's "new" docs (doc_id % 10 == 7) stream in across ≥3
  * micro-batches against the "old" corpus, and after the last batch the
  * standing union-find must hold EXACTLY the batch q65 labels of every
  * non-singleton component of the FULL corpus — within-batch,
  * cross-batch, and batch-vs-corpus near-dups included, in whichever
  * batches the endpoints arrived. Plus the durability legs every
  * standing fold carries: kill/restart parity against an unbroken run
  * (with the index rebuilt warehouse-style from the corpus as it then
  * stands), redelivery idempotence, and atomic snapshot round-trip. */
class StreamingClustersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def docsAll = graft.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"))

  private def corpus = docsAll.filter(col("doc_id") % 10 =!= 7)

  private def streamed: Array[(Long, String)] = {
    import spark.implicits._
    docsAll.filter(col("doc_id") % 10 === 7)
      .as[(Long, String)].collect().sortBy(_._1)
  }

  /** Corpus-internal verified pairs via the same public probe pipeline
    * the stage itself uses (new < old halves the symmetric set). */
  private def seedPairs(idx: IncrementalDedup.StandingIndex)
      : Seq[(Long, Long)] =
    IncrementalDedup.flag(corpus, idx)
      .filter(col("new_doc") < col("old_doc"))
      .select(col("new_doc"), col("old_doc")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  /** Batch q65's labels restricted to non-singleton components — the
    * exact set the pair-bounded standing state must hold. */
  private def expectedLabels: Map[Long, Long] = {
    val all = SparkEntry.queries("q65_dedup_clusters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sizes = all.groupBy(_._2).view.mapValues(_.length).toMap
    all.filter { case (_, c) => sizes(c) >= 2 }.toMap
  }

  private def feed(src: MemoryStream[(Long, String)],
      idx: IncrementalClusters.GrowingIndex, seeds: Seq[(Long, Long)],
      state: IncrementalClusters.State, ckpt: String,
      chunks: Seq[Seq[(Long, String)]]) = {
    val q = IncrementalClusters.start(
      src.toDF().toDF("doc_id", "text"), idx, seeds, ckpt, state, _ => ())
    chunks.foreach { c => src.addData(c); q.processAllAvailable() }
    q
  }

  test("standing labels equal batch q65's non-singleton components") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val base = IncrementalDedup.buildIndex(corpus)
    val idx = new IncrementalClusters.GrowingIndex(base)
    val seeds = seedPairs(base)
    assert(seeds.nonEmpty, "fixture must contain corpus-internal pairs")
    val chunks = streamed.grouped(
      math.max(1, streamed.length / 4 + 1)).map(_.toSeq).toSeq
    assert(chunks.length >= 3, "need cross-batch arrivals")
    val state = new IncrementalClusters.State
    val src = MemoryStream[(Long, String)]
    val q = feed(src, idx, seeds, state,
      Files.createTempDirectory("clusters-ck").toString, chunks)
    try {
      val expected = expectedLabels
      val got = state.get.root
      assert(got == expected,
        s"cluster divergence: stream-only=${got.toSet -- expected.toSet} " +
          s"batch-only=${expected.toSet -- got.toSet}")
      // q65 convention: untracked ids label as themselves
      val singleton = docsAll.select(col("doc_id")).collect()
        .map(_.getLong(0)).find(id => !expected.contains(id)).get
      assert(state.get.label(singleton) == singleton)
    } finally {
      q.stop()
      idx.release()
    }
  }

  test("kill/restart restores the snapshot — parity with unbroken run") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val chunks = streamed.grouped(
      math.max(1, streamed.length / 4 + 1)).map(_.toSeq).toSeq

    val baseA = IncrementalDedup.buildIndex(corpus)
    val idxA = new IncrementalClusters.GrowingIndex(baseA)
    val stateA = new IncrementalClusters.State
    val qA = feed(MemoryStream[(Long, String)], idxA, seedPairs(baseA),
      stateA, Files.createTempDirectory("clusters-unbroken").toString,
      chunks)
    qA.stop()

    // broken run: kill after 2 batches; the restarted caller rebuilds
    // the base index warehouse-style from the corpus AS IT NOW STANDS
    // (original corpus + the docs already streamed and committed)
    val ckpt = Files.createTempDirectory("clusters-restart").toString
    val baseB1 = IncrementalDedup.buildIndex(corpus)
    val idxB1 = new IncrementalClusters.GrowingIndex(baseB1)
    val seeds = seedPairs(baseB1)
    val src = MemoryStream[(Long, String)]
    val q1 = feed(src, idxB1, seeds, new IncrementalClusters.State, ckpt,
      chunks.take(2))
    q1.stop()
    idxB1.release()

    val deliveredDocs = chunks.take(2).flatten
    val grownCorpus = corpus.unionByName {
      import spark.implicits._
      deliveredDocs.toDF("doc_id", "text")
    }
    val baseB2 = IncrementalDedup.buildIndex(grownCorpus)
    val idxB2 = new IncrementalClusters.GrowingIndex(baseB2)
    val stateB = new IncrementalClusters.State
    assert(stateB.get.root.isEmpty, "fresh state starts empty")
    val q2 = feed(src, idxB2, seeds, stateB, ckpt, chunks.drop(2))
    try {
      assert(stateB.get.root == stateA.get.root,
        "restarted labels diverged from the unbroken run's")
    } finally {
      q2.stop()
      idxA.release()
      idxB2.release()
    }
  }

  test("leakAudit over the standing state equals batch q191") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    // the q191 split rule, replicated: first 8 md5 hex chars of the
    // doc id as a long, mod 10 — train < 8
    def isTrain(id: Long): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 10 < 8
    }
    val base = IncrementalDedup.buildIndex(corpus)
    val idx = new IncrementalClusters.GrowingIndex(base)
    val state = new IncrementalClusters.State
    val src = MemoryStream[(Long, String)]
    val chunks = streamed.grouped(
      math.max(1, streamed.length / 3 + 1)).map(_.toSeq).toSeq
    val q = feed(src, idx, seedPairs(base), state,
      Files.createTempDirectory("clusters-leak").toString, chunks)
    try {
      val (leaked, spanning) =
        IncrementalClusters.leakAudit(state.get, isTrain)
      val exp = SparkEntry.queries("q191_split_leakage")(spark, sfDir)
        .collect()(0)
      assert(leaked == exp.getLong(2),
        s"streaming leak count $leaked != batch q191 ${exp.getLong(2)}")
      assert(spanning == exp.getLong(4),
        s"spanning clusters $spanning != batch ${exp.getLong(4)}")
      assert(spanning > 0L, "fixture must have spanning clusters")
    } finally {
      q.stop()
      idx.release()
    }
  }

  test("mid-stream segment compaction leaves labels exact") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val chunks = streamed.grouped(
      math.max(1, streamed.length / 4 + 1)).map(_.toSeq).toSeq
    assert(chunks.length >= 3)
    val base = IncrementalDedup.buildIndex(corpus)
    val idx = new IncrementalClusters.GrowingIndex(base)
    val seeds = seedPairs(base)
    val state = new IncrementalClusters.State
    val src = MemoryStream[(Long, String)]
    val q = feed(src, idx, seeds, state,
      Files.createTempDirectory("clusters-compact").toString,
      chunks.take(2))
    try {
      assert(idx.segments >= 3, // base + one per delivered batch
        s"expected per-batch segments, got ${idx.segments}")
      // warehouse-style compaction: the corpus as it now stands —
      // original + every streamed-and-committed doc
      idx.compact(corpus.unionByName(
        chunks.take(2).flatten.toDF("doc_id", "text")))
      assert(idx.segments == 1, "compaction must fold to one base")
      chunks.drop(2).foreach { c => src.addData(c); q.processAllAvailable() }
      assert(state.get.root == expectedLabels,
        "labels after mid-stream compaction diverged from batch q65")
    } finally {
      q.stop()
      idx.release()
    }
  }

  test("redelivered batch is skipped and never re-appended") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val chunks = streamed.grouped(
      math.max(1, streamed.length / 2 + 1)).map(_.toSeq).toSeq.take(2)
    val ckpt = Files.createTempDirectory("clusters-replay").toString
    val base = IncrementalDedup.buildIndex(corpus)
    val idx = new IncrementalClusters.GrowingIndex(base)
    val seeds = seedPairs(base)
    val src = MemoryStream[(Long, String)]
    val q1 = feed(src, idx, seeds, new IncrementalClusters.State, ckpt,
      chunks)
    q1.stop()
    val frozen = IncrementalClusters
      .load(java.nio.file.Paths.get(ckpt, "graft-clusters-state",
        "snapshot")).get

    // forge an at-least-once redelivery of the last batch
    Files.delete(java.nio.file.Paths.get(ckpt, "commits", "1"))
    Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))
    val state2 = new IncrementalClusters.State
    val idx2 = new IncrementalClusters.GrowingIndex(
      IncrementalDedup.buildIndex(corpus.unionByName(
        chunks.flatten.toDF("doc_id", "text"))))
    val q2 = IncrementalClusters.start(
      src.toDF().toDF("doc_id", "text"), idx2, seeds, ckpt, state2,
      _ => ())
    try {
      q2.processAllAvailable()
      assert(state2.get.root == frozen.root,
        "replayed batch changed the state")
      assert(state2.get.lastBatch == frozen.lastBatch)
    } finally {
      q2.stop()
      idx.release()
      idx2.release()
    }
  }

  test("snapshot persist/load round-trips atomically") {
    val dir = Files.createTempDirectory("clusters-io")
    val f = dir.resolve("snapshot")
    val c = IncrementalClusters.Clusters(
      Map(5L -> 1L, 1L -> 1L, 9L -> 2L, 2L -> 2L), 7L)
    IncrementalClusters.persist(f, c)
    assert(IncrementalClusters.load(f).contains(c))
    // overwrite with a bigger map — ATOMIC_MOVE replaces, never tears
    val c2 = IncrementalClusters.Clusters(
      c.root + (11L -> 1L), 8L)
    IncrementalClusters.persist(f, c2)
    assert(IncrementalClusters.load(f).contains(c2))
  }

  test("merged() is a min-root union-find (independent replay)") {
    val pairs = Seq((5L, 3L), (3L, 9L), (20L, 30L), (9L, 5L))
    val m = IncrementalClusters.merged(Map.empty, pairs)
    assert(m == Map(5L -> 3L, 3L -> 3L, 9L -> 3L, 20L -> 20L, 30L -> 20L))
    // incremental merge joining two existing components
    val m2 = IncrementalClusters.merged(m, Seq((9L, 30L)))
    assert(m2 == Map(5L -> 3L, 3L -> 3L, 9L -> 3L, 20L -> 3L, 30L -> 3L))
  }
}
