package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import java.util.concurrent.atomic.AtomicReference

import graft.streaming.IncrementalDedup.{StandingIndex, buildIndex, buildSegment, flag}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** q65's transitive near-dup CLUSTERS as a STANDING streaming stage —
  * the step above [[IncrementalDedup]]'s per-pair flags: as documents
  * arrive, the stage maintains the connected-component labels of the
  * evolving verified-pair graph, so "which docs are the same document"
  * is answerable after every micro-batch without ever re-running the
  * batch closure.
  *
  * THE STATE IS PAIR-BOUNDED, NEVER CORPUS-BOUNDED: a union-find over
  * verified-pair ENDPOINTS only (docs that were ever flagged). A doc
  * that never near-dups anything is its own implicit singleton — the
  * exact q65 `labeled` convention (least(self, min reachable)), so the
  * label of an untracked id is the id itself and the driver-held map
  * grows with duplication mass, not data volume. Union attaches the
  * larger root under the smaller, so every component's label is its
  * minimum member id — bit-compatible with the batch operator.
  *
  * DRIVER-MEMORY BOUND — pair-bounded is still unbounded on an
  * adversarial mirror-heavy stream (every doc a near-dup), so the fold
  * takes an explicit `maxResident` cap: when the resident root map
  * exceeds it after a merge, every entry that is neither an endpoint
  * of the current batch's pairs nor a resolved root of one is spilled
  * to an append-only last-wins log beside the snapshot (values fully
  * resolved at eviction) and dropped from memory — including cold
  * members of still-hot clusters, so a single always-touched mirror
  * cluster cannot pin its whole membership. A later pair touching a
  * spilled doc reloads its entry by streaming the log (one pass per
  * parent-chain hop — chains stay short because evictions write
  * resolved roots). Degradation is therefore O(spill-file) extra I/O
  * per batch that references cold docs, never extra memory; resident
  * stays ≤ max(maxResident, endpoints∪roots of the current batch's
  * pairs) — the irreducible working set, since a batch's pairs can
  * legitimately name every past doc on a fully-mirrored stream.
  * [[Clusters.root]]
  * then holds only the RESIDENT entries — readouts that need the whole
  * map ([[resolvedAll]], [[leakAudit]] in bounded mode) stream the
  * spill transiently. [[State.metrics]] exposes (resident roots, spill
  * appends) — the operational alarm a deploy watches. Default
  * `Int.MaxValue` keeps the original fully-resident behavior.
  *
  * Per micro-batch (all joins keyed, costs batch- or dup-bounded):
  *  1. sign the batch once ([[IncrementalDedup.buildSegment]] — a
  *     SELF-CONTAINED checkpoint-pinned segment, reused in step 4; a
  *     persist-only segment would stay lineage-rooted in the ephemeral
  *     micro-batch frame and a post-commit cache loss would recompute
  *     against an expired batch relation, silently losing signatures);
  *  2. WITHIN-batch verified pairs: probe the batch against its own
  *     segment ([[IncrementalDedup.flag]], `new < old` halves the
  *     symmetric candidates and drops self-pairs);
  *  3. CROSS pairs: probe the batch against the growing index (base
  *     corpus + every earlier batch's segment), guarded
  *     `new_doc =!= old_doc` — after a crash that lands a batch's docs
  *     in the warehouse but not the snapshot, the restarted base index
  *     contains the replayed docs and an unguarded probe would
  *     self-flag (x, x), inserting singleton x→x state entries;
  *  4. merge the (bounded) collected pairs into the union-find,
  *     persist the snapshot, THEN append the batch's segment (append
  *     after probing, or the cross probe would see the batch's own
  *     self-pairs).
  *
  * At 100 TB the growing index is the same banded artifact the batch
  * family shares — a production deploy pre-partitions it by
  * (band, bkey) so the per-batch probe prunes instead of scanning all
  * segments, and periodically compacts segments into the base exactly
  * like [[IncrementalDedup.StandingIndexRef.refresh]] rotates it.
  *
  * DURABILITY — the same batch-commit discipline as the other standing
  * folds ([[IncrementalHeavyHitters]] et al.): after merging batch b
  * the resolved RESIDENT (doc → root) map plus b is written atomically
  * (temp + ATOMIC_MOVE) under the query's checkpoint dir (evicted
  * entries are appended to the spill log BEFORE the snapshot move, so
  * a crash between the two replays the batch against a log that
  * already holds the entries — last-wins absorbs the duplicate
  * append) and restored by [[start]]; a redelivered batchId ≤ the
  * snapshot's is skipped, so kill/restart and at-least-once retry
  * never double-merge (merging is idempotent anyway — union-find is —
  * but the skip also keeps the growing index consistent: a replayed
  * batch's docs are NOT re-appended, because a restarted caller
  * rebuilds the base index from the corpus as it now stands, streamed
  * docs included). `seedPairs` (the offline batch job's
  * corpus-internal verified pairs) apply only to a FRESH checkpoint; a
  * restored snapshot already contains them.
  */
object IncrementalClusters {

  /** Running cluster state: resolved doc → component-minimum map over
    * the RESIDENT verified-pair endpoints (every endpoint seen so far
    * unless a `maxResident` bound spilled cold clusters — see
    * [[resolvedAll]] for the full map), and the id of the last
    * micro-batch merged (−1 before any). */
  final case class Clusters(root: Map[Long, Long], lastBatch: Long = -1L) {
    /** q65 label semantics: untracked ids are their own cluster.
      * Bounded mode: resident-only — a spilled doc reads as a
      * singleton here; use [[resolvedAll]] for exact cold labels. */
    def label(id: Long): Long = root.getOrElse(id, id)
    /** Non-singleton membership, sorted — the batch-parity readout. */
    def labels: Seq[(Long, Long)] = root.toSeq.sorted
  }

  /** Operational telemetry: resident root-map size, total entries ever
    * appended to the spill log (0 in unbounded mode — the alarm signal
    * a capped deploy watches alongside resident). */
  final case class Metrics(residentRoots: Int, spillAppends: Long,
      lastBatch: Long)

  final class State {
    private[streaming] val ref = new AtomicReference(Clusters(Map.empty))
    @volatile private[streaming] var spillAppends: Long = 0L
    def get: Clusters = ref.get()
    def metrics: Metrics = {
      val c = ref.get()
      Metrics(c.root.size, spillAppends, c.lastBatch)
    }
  }

  /** The growing corpus artifact: the base index plus one persisted
    * segment per delivered batch. `composite` is a view (union of the
    * persisted frames — no recompute, no re-persist); release() owns
    * every segment. All access is synchronized: the scaladoc asks
    * callers to run [[compact]] between batches on the foreachBatch
    * thread, but a compact racing an append must never discard and
    * release the just-appended segment — the lock enforces the
    * discipline instead of assuming it (a racing compact folds either
    * before the append, leaving the new segment alive in the vector it
    * appends to, or after it, folding the segment into the base). */
  final class GrowingIndex(initial: StandingIndex) {
    private var segs: Vector[StandingIndex] = Vector(initial)
    private[streaming] def composite: StandingIndex = synchronized {
      StandingIndex(segs.map(_.bands).reduce(_.unionByName(_)),
        segs.map(_.sets).reduce(_.unionByName(_)))
    }
    private[streaming] def append(seg: StandingIndex): Unit =
      synchronized { segs = segs :+ seg }
    /** Number of live segments (base + one per delivered batch since
      * the last compaction) — the operational signal a deploy watches
      * to schedule [[compact]]. */
    def segments: Int = synchronized { segs.length }

    /** Fold every per-batch segment back into one base — the same
      * build-then-swap discipline as
      * [[IncrementalDedup.StandingIndexRef.refresh]]: the replacement
      * index is signed and materialized from `corpus` (the warehouse
      * state including every streamed doc) BEFORE the swap, so a batch
      * in flight keeps whichever segment vector it resolved via
      * [[composite]] (checkpoint-pinned segments stay readable until
      * released), and batches after the swap probe one segment instead
      * of N. The build runs OUTSIDE the lock (it is a full corpus
      * signing pass); only the swap itself synchronizes with
      * append/composite. The union-find state is untouched —
      * compaction changes WHERE signatures live, never what was
      * flagged. */
    def compact(corpus: DataFrame): Unit = {
      val next = buildIndex(corpus)
      val prev = synchronized {
        val p = segs
        segs = Vector(next)
        p
      }
      prev.foreach(_.release())
    }
    def release(): Unit = synchronized { segs.foreach(_.release()) }
  }

  /** Merge pairs into a resolved root map (pure — returns the new map).
    * Classic union-find with path compression; roots start as self, so
    * after attaching max-root under min-root every component's root is
    * its minimum member. Self-pairs (a == b) are dropped — the state
    * holds PAIR ENDPOINTS only, and a self-pair would insert a
    * singleton entry. Exposed for the spec's independent replay. */
  private[streaming] def merged(cur: Map[Long, Long],
      pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val p = scala.collection.mutable.Map.empty[Long, Long] ++ cur
    def find(x: Long): Long = {
      var r = x
      while (p.getOrElse(r, r) != r) r = p(r)
      var c = x
      while (p.getOrElse(c, c) != c) { val n = p(c); p(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      if (a != b) {
        val (ra, rb) = (find(a), find(b))
        p(a) = math.min(ra, rb); p(b) = math.min(ra, rb)
        if (ra != rb) p(math.max(ra, rb)) = math.min(ra, rb)
      }
    }
    p.keysIterator.toSeq.map(k => k -> find(k)).toMap
  }

  /** q191's split-leakage audit over the standing state — runnable
    * after ANY micro-batch (an onUpdate consumer): test docs sharing a
    * near-dup cluster with a train doc, and the spanning-cluster
    * count. EXACT for the whole corpus despite the pair-bounded state:
    * only pair endpoints can leak (a singleton's cluster has no other
    * member, so it can never span the split boundary), and the state
    * holds every endpoint. In BOUNDED mode pass
    * `Clusters(resolvedAll(...), lastBatch)` — the resident map alone
    * misses spilled endpoints. Driver-side algebra over O(state) — the
    * continuous form of the batch audit, so a pipeline can watch
    * leak counts rise AS near-dups stream in instead of discovering
    * them at eval time. Returns (leaked test docs, spanning clusters);
    * the caller supplies its own split rule and, for a ppm, its own
    * test-doc total (corpus-sized counts are not state the fold keeps). */
  def leakAudit(c: Clusters, isTrain: Long => Boolean): (Long, Long) = {
    val spanning = c.root.groupBy(_._2).valuesIterator.filter { ms =>
      ms.exists(m => isTrain(m._1)) && ms.exists(m => !isTrain(m._1))
    }.toSeq
    (spanning.iterator.map(_.count(m => !isTrain(m._1)).toLong).sum,
      spanning.size.toLong)
  }

  private def stateFile(checkpointDir: String): Path =
    Paths.get(checkpointDir, "graft-clusters-state", "snapshot")

  private def spillFile(checkpointDir: String): Path =
    Paths.get(checkpointDir, "graft-clusters-state", "spill")

  private[streaming] def persist(file: Path, c: Clusters): Unit = {
    Files.createDirectories(file.getParent)
    val tmp = file.resolveSibling("snapshot.tmp")
    val body = new StringBuilder
    body.append(c.lastBatch).append('\n')
    c.root.foreach { case (k, r) =>
      body.append(k).append(' ').append(r).append('\n')
    }
    Files.write(tmp, body.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private[streaming] def load(file: Path): Option[Clusters] =
    if (!Files.exists(file)) None
    else {
      val lines = Files.readAllLines(file, StandardCharsets.UTF_8)
      val root = (1 until lines.size).iterator.map { i =>
        val p = lines.get(i).split(' ')
        (p(0).toLong, p(1).toLong)
      }.toMap
      Some(Clusters(root, lines.get(0).trim.toLong))
    }

  /** Append evicted (doc → resolved root) entries to the last-wins
    * spill log. Append-only: a replayed batch re-appending the same
    * keys is harmless (the later line wins), and eviction never
    * rewrites history — compaction of the log is the deploy's offline
    * concern, exactly like segment compaction. */
  private[streaming] def appendSpill(file: Path,
      evicted: Iterable[(Long, Long)]): Unit = {
    Files.createDirectories(file.getParent)
    val body = new StringBuilder
    evicted.foreach { case (k, r) =>
      body.append(k).append(' ').append(r).append('\n')
    }
    Files.write(file, body.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    ()
  }

  /** One streaming pass over the spill log: last-wins values for the
    * requested ids (absent ids simply don't appear). O(file) time,
    * O(requested) memory. */
  private[streaming] def spillLookup(file: Path,
      ids: Set[Long]): Map[Long, Long] =
    if (ids.isEmpty || !Files.exists(file)) Map.empty
    else {
      val out = scala.collection.mutable.Map.empty[Long, Long]
      val src = scala.io.Source.fromFile(file.toFile)
      try src.getLines().foreach { line =>
        val sp = line.indexOf(' ')
        if (sp > 0) {
          val k = line.substring(0, sp).toLong
          if (ids.contains(k)) out(k) = line.substring(sp + 1).toLong
        }
      } finally src.close()
      out.toMap
    }

  /** Load `ids`' union-find entries from the spill log into `resident`:
    * one pass per parent-chain hop (values are resolved roots at
    * eviction time, so a hop only appears when the root itself was
    * later merged and re-evicted — chains stay short by construction;
    * the loop terminates because each pass either grows the map or
    * stops). Returns the augmented working map. */
  private[streaming] def loadSpilled(file: Path, resident: Map[Long, Long],
      ids: Set[Long]): Map[Long, Long] = {
    var working = resident
    var want = ids.filterNot(working.contains)
    var progress = true
    while (want.nonEmpty && progress) {
      val found = spillLookup(file, want)
      progress = found.nonEmpty
      working = working ++ found
      want = found.valuesIterator.filterNot(working.contains).toSet
    }
    working
  }

  /** The FULL resolved (doc → root) map — resident entries plus every
    * spilled one, re-resolved through the current residents. Streams
    * the spill log once and materializes the combined map TRANSIENTLY
    * (a readout-time cost, not standing state): the exact input
    * [[leakAudit]] and parity checks need in bounded mode. Unbounded
    * mode returns the resident map unchanged (no spill file). */
  def resolvedAll(checkpointDir: String, c: Clusters): Map[Long, Long] = {
    val file = spillFile(checkpointDir)
    if (!Files.exists(file)) c.root
    else {
      val all = scala.collection.mutable.Map.empty[Long, Long]
      val src = scala.io.Source.fromFile(file.toFile)
      try src.getLines().foreach { line =>
        val sp = line.indexOf(' ')
        if (sp > 0)
          all(line.substring(0, sp).toLong) =
            line.substring(sp + 1).toLong
      } finally src.close()
      c.root.foreach { case (k, v) => all(k) = v } // resident wins
      def find(x: Long): Long = {
        var r = x
        while (all.getOrElse(r, r) != r) r = all(r)
        r
      }
      all.keysIterator.map(k => k -> find(k)).toMap
    }
  }

  /** Restore (or seed) the fold's state from a checkpoint dir — the
    * startup half of [[start]], public so a host pipeline that folds
    * clusters inside its OWN foreachBatch (the ingest daemon) gets the
    * same crash-restart semantics. */
  def initState(checkpointDir: String, state: State,
      seedPairs: Seq[(Long, Long)] = Nil): Unit =
    load(stateFile(checkpointDir)) match {
      case Some(c) => state.ref.set(c)
      case None => state.ref.set(Clusters(merged(Map.empty, seedPairs)))
    }

  /** One micro-batch of the standing fold, callable from ANY
    * foreachBatch — the daemon folds clusters in the same batch
    * transaction as its warehouse route, so one source and one
    * checkpoint lineage serve both. `batchDocs` is a batch-mode
    * (doc_id, text) frame; replays (batchId ≤ lastBatch) are skipped
    * with the already-current state, exactly as in [[start]]. Call
    * [[initState]] once before the stream starts. */
  def foldBatch(batchDocs: DataFrame, batchId: Long, idx: GrowingIndex,
      checkpointDir: String, state: State, onUpdate: Clusters => Unit,
      maxResident: Int = Int.MaxValue): Unit = {
    val file = stateFile(checkpointDir)
    val spill = spillFile(checkpointDir)
    val cur = state.ref.get()
    if (batchId <= cur.lastBatch) onUpdate(cur)
    else {
      val b = batchDocs.select(col("doc_id"), col("text")).persist()
      try {
        val seg = buildSegment(b)
        val within = flag(b, seg)
          .filter(col("new_doc") < col("old_doc"))
          .select(col("new_doc"), col("old_doc")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        val cross = flag(b, idx.composite)
          .filter(col("new_doc") =!= col("old_doc"))
          .select(col("new_doc"), col("old_doc")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
        val pairs = within ++ cross
        // bounded mode: fault cold endpoints' entries in from the
        // spill log before merging, so the union-find sees every
        // chain it needs
        val endpoints = pairs.iterator
          .flatMap(p => Iterator(p._1, p._2)).toSet
        val workingRoot =
          if (maxResident == Int.MaxValue) cur.root
          else loadSpilled(spill, cur.root, endpoints)
        val full = merged(workingRoot, pairs)
        val next =
          if (full.size <= maxResident) Clusters(full, batchId)
          else {
            // spill every entry that is neither an endpoint of this
            // batch's pairs nor a resolved root of one — cold
            // MEMBERS of hot clusters spill too (their values are
            // fully resolved, so correctness never needs them
            // resident; a reload is one log pass away). Keeping
            // whole touched clusters instead would let one
            // always-hot mirror cluster pin its entire membership
            // forever, defeating the bound.
            val touchedRoots = endpoints.flatMap(full.get)
            val (keep, evict) = full.partition { case (k, _) =>
              endpoints.contains(k) || touchedRoots.contains(k)
            }
            appendSpill(spill, evict)
            state.spillAppends += evict.size
            Clusters(keep, batchId)
          }
        persist(file, next)
        idx.append(seg)
        state.ref.set(next)
        onUpdate(next)
      } finally {
        b.unpersist()
        ()
      }
    }
  }

  /** Run the standing fold over a (doc_id, text) streaming frame;
    * `onUpdate` fires after every micro-batch (including skipped
    * redeliveries, with the already-current state). `maxResident`
    * bounds the driver-held root map (see the class doc's
    * DRIVER-MEMORY BOUND section); the default keeps every endpoint
    * resident. */
  def start(docStream: DataFrame, idx: GrowingIndex,
      seedPairs: Seq[(Long, Long)], checkpointDir: String, state: State,
      onUpdate: Clusters => Unit,
      maxResident: Int = Int.MaxValue): StreamingQuery = {
    initState(checkpointDir, state, seedPairs)
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, idx, checkpointDir, state, onUpdate,
          maxResident)
      }
      .start()
  }
}
