package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicReference

import graft.functions.KmvAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** q105's KMV distinct-count sketch as a STANDING streaming stage — the
  * third standing fold next to [[IncrementalDedup]] and
  * [[IncrementalHeavyHitters]], and the strongest of the three
  * guarantees: a KMV sketch is literally "the K smallest distinct
  * hashes", a pure set function of everything seen, so the left-fold is
  * EXACT — after any number of micro-batches the standing sketch is
  * bit-identical to one batch aggregate over the concatenated stream
  * (no merge-tree dependence at all; the spec pins this equality after
  * every batch). That makes the standing estimate the same estimate a
  * nightly batch job would print, with O(K) state forever — the
  * "distinct users/tokens so far today" readout a 100 TB/day ingest
  * keeps without ever re-scanning history.
  *
  * DURABILITY — identical discipline to [[IncrementalHeavyHitters]]
  * (the batch-commit-marker pattern): after folding batch b the
  * (sketch, n, b) snapshot is written atomically under the query's own
  * checkpoint dir, `start()` restores it before the first batch, and a
  * redelivered batchId ≤ the persisted one is skipped, so exact n and
  * the sketch survive kill/restart and at-least-once batch retry.
  */
object IncrementalDistinct {

  /** Running state: the ascending ≤K-mins hash array, total rows seen,
    * and the last merged micro-batch id (−1 before any batch). */
  final case class Summary(mins: Vector[Long], n: Long,
      lastBatch: Long = -1L) {
    /** The q105 estimate: a short sketch IS the exact distinct set; a
      * full one scales the K-th minimum back up to the 2^48 domain. */
    def estimate: Long =
      if (mins.size < KmvAgg.K) mins.size.toLong
      else (KmvAgg.K - 1).toLong * KmvAgg.Domain / mins(KmvAgg.K - 1)
  }

  final class State {
    private[streaming] val ref =
      new AtomicReference(Summary(Vector.empty, 0L))
    def get: Summary = ref.get()
  }

  private def stateFile(checkpointDir: String): Path =
    Paths.get(checkpointDir, "graft-kmv-state", "sketch")

  /** Atomic persist (temp sibling + ATOMIC_MOVE): old or new snapshot,
    * never a torn read. O(K) bytes. */
  private[streaming] def persist(file: Path, s: Summary): Unit = {
    Files.createDirectories(file.getParent)
    val tmp = file.resolveSibling("sketch.tmp")
    val body = (s"${s.lastBatch} ${s.n}" +: s.mins.map(_.toString))
      .mkString("", "\n", "\n")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, file, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private[streaming] def load(file: Path): Option[Summary] =
    if (!Files.exists(file)) None
    else {
      val lines = Files.readAllLines(file, StandardCharsets.UTF_8)
      val head = lines.get(0).split(' ')
      val mins = (1 until lines.size).iterator
        .map(lines.get(_).trim).filter(_.nonEmpty).map(_.toLong).toVector
      Some(Summary(mins, head(1).toLong, head(0).toLong))
    }

  /** Run the standing fold over a streaming frame with a string column
    * `w` (tokens, user keys, URLs — whatever is being counted). The
    * 48-bit hash is the q105 md5 contract, computed in SQL so any batch
    * job or oracle hashes identically. `onUpdate` fires after every
    * micro-batch (including skipped redeliveries). */
  def start(tokenStream: DataFrame, state: State, checkpointDir: String,
      onUpdate: Summary => Unit): StreamingQuery = {
    val file = stateFile(checkpointDir)
    load(file).foreach(state.ref.set)
    tokenStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import batch.sparkSession.implicits._
        val cur = state.ref.get()
        if (batchId <= cur.lastBatch) {
          onUpdate(cur) // redelivery of a merged batch: already in state
        } else {
          // one pass: each partition folds to (≤K-mins partial, count);
          // the collect is bounded at partitions × K longs
          val partials = batch.select(expr(
              "cast(conv(substring(md5(w), 1, 12), 16, 10) as bigint)"))
            .as[Long]
            .mapPartitions { it =>
              var n = 0L
              var buf = KmvAgg.zero
              it.foreach { h => buf = KmvAgg.reduce(buf, h); n += 1 }
              Iterator.single((buf.toSeq, n))
            }
            .collect()
          val merged = partials.foldLeft(cur.mins.toArray) { (acc, p) =>
            KmvAgg.merge(acc, p._1.toArray)
          }
          val next = Summary(merged.toVector,
            cur.n + partials.map(_._2).sum, batchId)
          // persist BEFORE publishing (the TableRouter order): a crash
          // between the two replays the batch, the guard skips it
          persist(file, next)
          state.ref.set(next)
          onUpdate(next)
        }
        ()
      }
      .start()
  }
}
