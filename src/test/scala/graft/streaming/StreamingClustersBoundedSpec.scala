package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The `maxResident` driver-memory bound of [[IncrementalClusters]]
  * under an ADVERSARIAL high-duplication stream — every streamed doc is
  * a near-dup (a one-word variant of a template, shingle Jaccard
  * 21/23 ≈ 0.91), so the pair-bounded state grows with every batch and
  * the cap must actually evict. Templates rotate across batches
  * (batch b streams variants of templates {2b, 2b+1} only), so earlier
  * clusters go quiescent — the documented spill case — and a final
  * revisit batch touches a COLD (fully spilled) cluster to exercise the
  * fault-in path. Parity oracle: an UNBOUNDED twin fold fed the
  * identical chunks; [[IncrementalClusters.resolvedAll]] over the
  * bounded run must equal the twin's full root map after every stop
  * point, and the bounded [[IncrementalClusters.leakAudit]] (fed
  * resolvedAll, per its contract) must match the twin's. */
class StreamingClustersBoundedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Templates = 8
  private def tmpl(t: Int): String =
    (1 to 24).map(i => s"t${t}w$i").mkString(" ")
  /** One-word-tail variant — same 23-token prefix as the template. */
  private def variant(t: Int, v: Long): String =
    ((1 to 23).map(i => s"t${t}w$i") :+ s"v$v").mkString(" ")

  private def baseCorpus: DataFrame = {
    import spark.implicits._
    (0 until Templates).map(t => (900L + t, tmpl(t))).toDF("doc_id", "text")
  }

  /** Batch b = 12 variants of templates {2b, 2b+1}; ids 1..48. */
  private def chunks: Seq[Seq[(Long, String)]] =
    (0 until 4).map { b =>
      (0 until 12).map { k =>
        val id = b * 12L + k + 1
        (id, variant(2 * b + (k % 2), id))
      }
    }

  /** The cold-cluster revisit: 6 more variants of template 0, whose
    * cluster was last touched in batch 0 and is fully spilled by now. */
  private def revisit: Seq[(Long, String)] =
    (0 until 6).map { k => val id = 101L + k; (id, variant(0, id)) }

  private def run(src: MemoryStream[(Long, String)], ckpt: String,
      feedChunks: Seq[Seq[(Long, String)]], maxResident: Int,
      grownFrom: Seq[(Long, String)] = Nil)
      : IncrementalClusters.State = {
    import spark.implicits._
    val corpus =
      if (grownFrom.isEmpty) baseCorpus
      else baseCorpus.unionByName(grownFrom.toDF("doc_id", "text"))
    val idx = new IncrementalClusters.GrowingIndex(
      IncrementalDedup.buildIndex(corpus))
    val state = new IncrementalClusters.State
    val q = IncrementalClusters.start(src.toDF().toDF("doc_id", "text"),
      idx, Nil, ckpt, state, _ => (), maxResident)
    try feedChunks.foreach { c => src.addData(c); q.processAllAvailable() }
    finally { q.stop(); idx.release() }
    state
  }

  private def freshSrc: MemoryStream[(Long, String)] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    MemoryStream[(Long, String)]
  }

  test("cap evicts quiescent clusters; resolvedAll keeps exact parity") {
    val all = chunks :+ revisit
    val ckptB = Files.createTempDirectory("clb-bounded").toString
    val bounded = run(freshSrc, ckptB, all, maxResident = 20)
    val unbounded = run(freshSrc,
      Files.createTempDirectory("clb-unbounded").toString, all,
      maxResident = Int.MaxValue)

    val fullSize = unbounded.get.root.size
    assert(fullSize >= 50, s"fixture must be duplication-heavy: $fullSize")
    val m = bounded.metrics
    assert(m.spillAppends > 0, "cap never engaged — not adversarial")
    assert(m.residentRoots < fullSize,
      s"resident ${m.residentRoots} not bounded below full $fullSize")
    // the documented bound: resident ≤ max(cap, endpoints∪roots of the
    // last batch) — the revisit batch pairs 6 new docs with the 13
    // template-0 docs, so ≤ 20 entries stay resident
    assert(m.residentRoots <= 20,
      s"resident ${m.residentRoots} exceeds the working-set bound")

    val resolved = IncrementalClusters.resolvedAll(ckptB, bounded.get)
    assert(resolved == unbounded.get.root,
      s"bounded resolvedAll diverged: only-bounded=" +
        s"${resolved.toSet -- unbounded.get.root.toSet} only-unbounded=" +
        s"${unbounded.get.root.toSet -- resolved.toSet}")

    // a spilled doc reads as a singleton resident-wise (documented);
    // resolvedAll restores its true label
    val spilledId = unbounded.get.root.keysIterator
      .find(id => !bounded.get.root.contains(id)).get
    assert(bounded.get.label(spilledId) == spilledId)
    assert(resolved(spilledId) == unbounded.get.root(spilledId))

    // bounded-mode leakAudit contract: feed it resolvedAll
    def isTrain(id: Long): Boolean = id % 2 == 0
    val audited = IncrementalClusters.leakAudit(
      IncrementalClusters.Clusters(resolved, bounded.get.lastBatch),
      isTrain)
    assert(audited ==
      IncrementalClusters.leakAudit(unbounded.get, isTrain))
    assert(audited._2 > 0, "fixture must have spanning clusters")
  }

  test("bounded kill/restart: snapshot + spill log restore parity") {
    val ckpt = Files.createTempDirectory("clb-restart").toString
    // kill after 2 batches (template-0/1 clusters spilled by then);
    // the SAME MemoryStream continues after the kill so the restarted
    // query's source offsets line up with the checkpoint
    val src = freshSrc
    val s1 = run(src, ckpt, chunks.take(2), maxResident = 20)
    assert(s1.metrics.spillAppends > 0, "cap must engage before the kill")
    // restart: caller rebuilds the index from the corpus as it now
    // stands; the fresh State restores resident from the snapshot and
    // the spill log stays beside it
    val s2 = run(src, ckpt, chunks.drop(2) :+ revisit, maxResident = 20,
      grownFrom = chunks.take(2).flatten)

    val unbroken = run(freshSrc,
      Files.createTempDirectory("clb-unbroken").toString,
      chunks :+ revisit, maxResident = Int.MaxValue)
    assert(IncrementalClusters.resolvedAll(ckpt, s2.get) ==
      unbroken.get.root,
      "restarted bounded run diverged from the unbroken unbounded run")
  }

  test("spill log: last-wins lookup, chain reload, absent ids") {
    val dir = Files.createTempDirectory("clb-spill")
    val f = dir.resolve("spill")
    IncrementalClusters.appendSpill(f, Seq(5L -> 3L, 9L -> 7L))
    // re-eviction after 3's cluster merged under 1: later lines win
    IncrementalClusters.appendSpill(f, Seq(3L -> 1L))
    assert(IncrementalClusters.spillLookup(f, Set(5L, 9L, 42L)) ==
      Map(5L -> 3L, 9L -> 7L))
    assert(IncrementalClusters.spillLookup(f, Set(3L)) == Map(3L -> 1L))
    // chain reload: 5 → 3 (stale) → 1, one pass per hop
    val loaded = IncrementalClusters.loadSpilled(f, Map(1L -> 1L), Set(5L))
    assert(loaded == Map(1L -> 1L, 5L -> 3L, 3L -> 1L))
    // merged() over the faulted-in chain resolves to the true root
    assert(IncrementalClusters.merged(loaded, Seq(5L -> 9L))
      .forall { case (k, v) => v == 1L || (k == 7L || k == 9L) })
    // absent ids terminate without progress
    assert(IncrementalClusters.loadSpilled(f, Map.empty, Set(42L)) ==
      Map.empty)
  }
}
