package graft.streaming

import graft.queries.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.DataFrame

/** q120's incremental near-dup detection as a STANDING streaming stage:
  * the corpus band index and shingle sets are built once (the offline
  * artifact a production deploy refreshes on corpus compaction), and each
  * arriving micro-batch of documents is signed, probed against the index,
  * and Jaccard-verified — the point where the reference's streaming
  * surface (MQTT → foreachBatch) and the LLM-dedup stack meet.
  *
  * Parity contract: a document flagged by the batch q120 query is flagged
  * with the SAME (new_doc, old_doc, jaccard) row in whichever micro-batch
  * it arrives, because batch and stream share the exact signature
  * ([[Dedup.bandedOf]]) and verification ([[Dedup.shingleSetsOf]])
  * pipelines — `StreamingIncrementalDedupSpec` pins this across ≥3
  * micro-batches against the fixture corpus.
  *
  * Scale shape: per-batch cost is batch-sized (sign the batch, one
  * (band, bkey) equi-join against the persisted index, verification joins
  * only the candidate ids) — the corpus is never re-signed and never
  * shuffled; at 100 TB the index is the same banded artifact the batch
  * family shares, pre-partitioned by (band, bkey) so the per-batch probe
  * co-locates without a corpus-side shuffle. The batch side of each join
  * is micro-batch-sized and broadcastable by AQE.
  */
object IncrementalDedup {

  /** The standing corpus artifact: banded signatures + shingle sets,
    * both persisted (callers release via [[StandingIndex.release]]).
    * Release also drops `localCheckpoint` blocks, so checkpoint-pinned
    * segments ([[buildSegment]]) share the same lifecycle. */
  final case class StandingIndex(bands: DataFrame, sets: DataFrame) {
    def release(): Unit = {
      bands.unpersist()
      sets.unpersist()
      graft.Resources.releaseCheckpoint(bands)
      graft.Resources.releaseCheckpoint(sets)
      ()
    }
  }

  /** Build (and materialize) the standing index from a (doc_id, text)
    * corpus frame. */
  def buildIndex(oldDocs: DataFrame): StandingIndex = {
    val bands = Dedup.bandedOf(oldDocs)
      .withColumnsRenamed(Map("doc_id" -> "old_doc")).persist()
    val sets = Dedup.shingleSetsOf(oldDocs)
      .withColumnsRenamed(Map("doc_id" -> "old_doc", "shset" -> "sb"))
      .persist()
    bands.count()
    sets.count()
    StandingIndex(bands, sets)
  }

  /** [[buildIndex]] variant whose frames are SELF-CONTAINED (eager
    * `localCheckpoint` — `LogicalRDD` leaves with no upstream lineage).
    * For PER-BATCH segments of a growing index
    * ([[IncrementalClusters.GrowingIndex]]): a persist()-only segment
    * built inside `foreachBatch` stays lineage-rooted in the ephemeral
    * micro-batch frame, so a cache-block loss after the batch commits
    * would recompute against an expired batch relation — for sources
    * that discard batch data after commit that silently yields EMPTY
    * signatures and future cross-batch pairs are missed. The checkpoint
    * severs that root: a lost block is rebuilt from the checkpoint's
    * own storage, never the batch. Costs one extra pass over the
    * (batch-sized) staged frames. Release via [[StandingIndex.release]]
    * (checkpoint-aware). */
  def buildSegment(batchDocs: DataFrame): StandingIndex = {
    val staged = buildIndex(batchDocs)
    val seg = StandingIndex(staged.bands.localCheckpoint(true),
      staged.sets.localCheckpoint(true))
    staged.release()
    seg
  }

  /** Flag the verified near-dups of `batch` (a (doc_id, text) frame)
    * against the standing index: LSH candidates via the (band, bkey)
    * probe, then exact shingle Jaccard ≥ 0.5 — the q120 rule. */
  def flag(batch: DataFrame, idx: StandingIndex): DataFrame = {
    val cand = Dedup.bandedOf(batch)
      .withColumnsRenamed(Map("doc_id" -> "new_doc"))
      .join(idx.bands, Seq("band", "bkey"))
      .select(col("new_doc"), col("old_doc")).distinct()
    val newSets = Dedup.shingleSetsOf(batch)
      .withColumnsRenamed(Map("doc_id" -> "new_doc", "shset" -> "sa"))
    cand.join(newSets, "new_doc").join(idx.sets, "old_doc")
      .withColumn("jaccard",
        size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb"))))
      .filter(col("jaccard") >= 0.5)
      .select(col("new_doc"), col("old_doc"), col("jaccard"))
  }

  /** Swappable holder for the standing index — the REFRESH semantics a
    * production standing stage needs when the corpus compacts: build the
    * replacement index fully, swap the reference atomically, release the
    * old one. Micro-batch boundaries are the only read points
    * ([[start]] resolves the reference ONCE per batch), so every batch
    * is probed against exactly one coherent index — a batch in flight
    * during a refresh keeps the reference it resolved, and since the
    * index frames are persisted (never checkpoint-truncated) the
    * post-swap release only drops cache; lineage recompute keeps the
    * in-flight batch correct. No flag is missed and none duplicated
    * across the swap: each document is probed exactly once, against
    * whichever index its batch resolved. */
  final class StandingIndexRef(initial: StandingIndex) {
    private val ref =
      new java.util.concurrent.atomic.AtomicReference(initial)
    def get: StandingIndex = ref.get()

    /** Build-then-swap: the new corpus is signed and materialized
      * BEFORE the swap, so no batch ever probes a half-built index. */
    def refresh(newCorpus: DataFrame): Unit = {
      val next = buildIndex(newCorpus)
      val prev = ref.getAndSet(next)
      prev.release()
    }

    def release(): Unit = ref.get().release()
  }

  /** Run the probe as a streaming query over any (doc_id, text)
    * streaming frame; each micro-batch's flagged pairs go to `sink`
    * (a parquet append, a quarantine router, a metrics emitter). */
  def start(docStream: DataFrame, idx: StandingIndex,
      checkpointDir: String, sink: DataFrame => Unit): StreamingQuery =
    start(docStream, new StandingIndexRef(idx), checkpointDir, sink)

  /** Delivered-batch marker under the checkpoint dir — the same
    * batch-commit discipline as `TableRouter`/`IncrementalHeavyHitters`,
    * giving the sink effectively-once delivery across restart and
    * at-least-once batch retry. Written AFTER the sink returns (so an
    * uncommitted batch replays — the sink side is at-least-once only in
    * the crash window between sink completion and the marker write),
    * read once at start(). */
  private def markerFile(checkpointDir: String): java.nio.file.Path =
    java.nio.file.Paths.get(checkpointDir, "graft-dedup-state", "delivered")

  private[streaming] def readMarker(checkpointDir: String): Long = {
    val f = markerFile(checkpointDir)
    if (java.nio.file.Files.exists(f))
      new String(java.nio.file.Files.readAllBytes(f),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    else -1L
  }

  private[streaming] def writeMarker(checkpointDir: String,
      batchId: Long): Unit = {
    val f = markerFile(checkpointDir)
    java.nio.file.Files.createDirectories(f.getParent)
    val tmp = f.resolveSibling("delivered.tmp")
    java.nio.file.Files.write(tmp, batchId.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, f,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** As above with a swappable index: [[StandingIndexRef.refresh]]
    * between micro-batches rotates the corpus artifact without
    * restarting the query.
    *
    * Restart semantics (pinned by `StreamingIncrementalDedupSpec`'s
    * restart leg): a batch REPLAYED after restart (redelivered by the
    * at-least-once checkpoint) is skipped via the delivered marker —
    * its flags were already sunk pre-restart, so they are neither
    * duplicated nor re-derived against whatever (possibly newer) index
    * generation the restarted process built. RESUMED batches — genuinely
    * new data — probe the CURRENT generation, i.e. the index the
    * restarted caller constructed from the corpus as it now stands.
    * Each document is therefore flagged exactly once, against the
    * generation live when its batch first completed. */
  def start(docStream: DataFrame, idx: StandingIndexRef,
      checkpointDir: String, sink: DataFrame => Unit): StreamingQuery = {
    @volatile var delivered = readMarker(checkpointDir)
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId > delivered) {
          sink(flag(batch, idx.get))
          writeMarker(checkpointDir, batchId)
          delivered = batchId
        }
        ()
      }
      .start()
  }
}
