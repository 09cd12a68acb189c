package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicReference

import graft.streaming.IncrementalDedup.{StandingIndex, buildIndex, flag}
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
  * Per micro-batch (all joins keyed, costs batch- or dup-bounded):
  *  1. sign the batch once ([[IncrementalDedup.buildIndex]] — the
  *     batch's own segment, reused in step 4);
  *  2. WITHIN-batch verified pairs: probe the batch against its own
  *     segment ([[IncrementalDedup.flag]], `new < old` halves the
  *     symmetric candidates and drops self-pairs);
  *  3. CROSS pairs: probe the batch against the growing index (base
  *     corpus + every earlier batch's segment) — so near-dups between
  *     two streamed documents are caught no matter how many batches
  *     apart they arrived;
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
  * the fully-resolved (doc → root) map plus b is written atomically
  * (temp + ATOMIC_MOVE) under the query's checkpoint dir and restored
  * by [[start]]; a redelivered batchId ≤ the snapshot's is skipped, so
  * kill/restart and at-least-once retry never double-merge (merging is
  * idempotent anyway — union-find is — but the skip also keeps the
  * growing index consistent: a replayed batch's docs are NOT
  * re-appended, because a restarted caller rebuilds the base index
  * from the corpus as it now stands, streamed docs included).
  * `seedPairs` (the offline batch job's corpus-internal verified
  * pairs) apply only to a FRESH checkpoint; a restored snapshot
  * already contains them.
  */
object IncrementalClusters {

  /** Running cluster state: fully-resolved doc → component-minimum map
    * over every verified-pair endpoint seen so far, and the id of the
    * last micro-batch merged (−1 before any). */
  final case class Clusters(root: Map[Long, Long], lastBatch: Long = -1L) {
    /** q65 label semantics: untracked ids are their own cluster. */
    def label(id: Long): Long = root.getOrElse(id, id)
    /** Non-singleton membership, sorted — the batch-parity readout. */
    def labels: Seq[(Long, Long)] = root.toSeq.sorted
  }

  final class State {
    private[streaming] val ref = new AtomicReference(Clusters(Map.empty))
    def get: Clusters = ref.get()
  }

  /** The growing corpus artifact: the base index plus one persisted
    * segment per delivered batch. `composite` is a view (union of the
    * persisted frames — no recompute, no re-persist); release() owns
    * every segment. */
  final class GrowingIndex(initial: StandingIndex) {
    @volatile private var segs: Vector[StandingIndex] = Vector(initial)
    private[streaming] def composite: StandingIndex = {
      val s = segs
      StandingIndex(s.map(_.bands).reduce(_.unionByName(_)),
        s.map(_.sets).reduce(_.unionByName(_)))
    }
    private[streaming] def append(seg: StandingIndex): Unit =
      segs = segs :+ seg
    /** Number of live segments (base + one per delivered batch since
      * the last compaction) — the operational signal a deploy watches
      * to schedule [[compact]]. */
    def segments: Int = segs.length

    /** Fold every per-batch segment back into one base — the same
      * build-then-swap discipline as
      * [[IncrementalDedup.StandingIndexRef.refresh]]: the replacement
      * index is signed and materialized from `corpus` (the warehouse
      * state including every streamed doc) BEFORE the swap, so a batch
      * in flight keeps whichever segment vector it resolved via
      * [[composite]] (persisted frames stay recomputable as cache-only
      * drops), and batches after the swap probe one segment instead of
      * N. Run it between micro-batches on the stage's driver (the
      * foreachBatch callback thread), or accept the in-flight-batch
      * semantics above. The union-find state is untouched — compaction
      * changes WHERE signatures live, never what was flagged. */
    def compact(corpus: DataFrame): Unit = {
      val next = buildIndex(corpus)
      val prev = segs
      segs = Vector(next)
      prev.foreach(_.release())
    }
    def release(): Unit = segs.foreach(_.release())
  }

  /** Merge pairs into a resolved root map (pure — returns the new map).
    * Classic union-find with path compression; roots start as self, so
    * after attaching max-root under min-root every component's root is
    * its minimum member. Exposed for the spec's independent replay. */
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
      val (ra, rb) = (find(a), find(b))
      p(a) = math.min(ra, rb); p(b) = math.min(ra, rb)
      if (ra != rb) p(math.max(ra, rb)) = math.min(ra, rb)
    }
    p.keysIterator.toSeq.map(k => k -> find(k)).toMap
  }

  /** q191's split-leakage audit over the standing state — runnable
    * after ANY micro-batch (an onUpdate consumer): test docs sharing a
    * near-dup cluster with a train doc, and the spanning-cluster
    * count. EXACT for the whole corpus despite the pair-bounded state:
    * only pair endpoints can leak (a singleton's cluster has no other
    * member, so it can never span the split boundary), and the state
    * holds every endpoint. Driver-side algebra over O(state) — the
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

  /** Run the standing fold over a (doc_id, text) streaming frame;
    * `onUpdate` fires after every micro-batch (including skipped
    * redeliveries, with the already-current state). */
  def start(docStream: DataFrame, idx: GrowingIndex,
      seedPairs: Seq[(Long, Long)], checkpointDir: String, state: State,
      onUpdate: Clusters => Unit): StreamingQuery = {
    val file = stateFile(checkpointDir)
    load(file) match {
      case Some(c) => state.ref.set(c)
      case None => state.ref.set(Clusters(merged(Map.empty, seedPairs)))
    }
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cur = state.ref.get()
        if (batchId <= cur.lastBatch) onUpdate(cur)
        else {
          val b = batch.select(col("doc_id"), col("text")).persist()
          try {
            val seg = buildIndex(b)
            val within = flag(b, seg)
              .filter(col("new_doc") < col("old_doc"))
              .select(col("new_doc"), col("old_doc")).collect()
              .map(r => (r.getLong(0), r.getLong(1))).toSeq
            val cross = flag(b, idx.composite)
              .select(col("new_doc"), col("old_doc")).collect()
              .map(r => (r.getLong(0), r.getLong(1))).toSeq
            val next =
              Clusters(merged(cur.root, within ++ cross), batchId)
            persist(file, next)
            idx.append(seg)
            state.ref.set(next)
            onUpdate(next)
          } finally {
            b.unpersist()
            ()
          }
        }
        ()
      }
      .start()
  }
}
