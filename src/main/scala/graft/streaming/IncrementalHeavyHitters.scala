package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import graft.functions.MisraGriesAgg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** q166's heavy-hitter surveillance as a STANDING streaming stage — the
  * payoff of the Misra–Gries summary being MERGEABLE: each micro-batch
  * folds to per-partition ≤ K−1-counter partials (bounded collect:
  * partitions × K pairs), and the standing state is just the running
  * merged summary plus the running row count. History is never
  * re-scanned; the state is O(K) bytes forever; and the merged summary
  * carries the batch guarantee forward — every id whose TOTAL frequency
  * across all batches exceeds N/K is in the candidate set at every
  * point in time (the superset property survives arbitrary merge trees,
  * so in particular this left-fold).
  *
  * Consumers confirm candidates exactly the same way q166 does: a
  * bounded recount over the accumulated corpus (or accept the summary's
  * N/K-undercount estimates when a scan is off the table).
  * `StreamingHeavyHittersSpec` pins the fold against batch q166's exact
  * set across 4 micro-batches.
  */
object IncrementalHeavyHitters {

  /** Running summary: the merged MG buffer and total rows seen. */
  final case class Summary(buf: Map[Long, Long], n: Long) {
    /** Candidate ids (superset of all true heavy hitters), sorted. */
    def candidates: Seq[Long] = buf.keys.toSeq.sorted
  }

  final class State {
    private[streaming] val ref = new AtomicReference(Summary(Map.empty, 0L))
    def get: Summary = ref.get()
  }

  /** Run the standing fold as a streaming query over a frame with a
    * `user_id` column; `onUpdate` receives the merged summary after
    * every micro-batch. */
  def start(userStream: DataFrame, state: State, checkpointDir: String,
      onUpdate: Summary => Unit): StreamingQuery =
    userStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import batch.sparkSession.implicits._
        // one pass: each partition folds to (MG partial, row count); the
        // collect is bounded at partitions × (K−1) counter pairs
        val partials = batch.select(col("user_id").cast("long"))
          .as[Long]
          .mapPartitions { it =>
            var n = 0L
            var buf = Map.empty[Long, Long]
            it.foreach { x => buf = MisraGriesAgg.reduce(buf, x); n += 1 }
            Iterator.single((buf.toSeq, n))
          }
          .collect()
        val merged = partials.foldLeft(Map.empty[Long, Long]) {
          (acc, p) => MisraGriesAgg.merge(acc, p._1.toMap)
        }
        val batchN = partials.map(_._2).sum
        val next = state.ref.updateAndGet { cur =>
          Summary(MisraGriesAgg.merge(cur.buf, merged), cur.n + batchN)
        }
        onUpdate(next)
        ()
      }
      .start()
}
