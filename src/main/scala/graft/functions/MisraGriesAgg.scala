package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary (Misra & Gries '82) as a typed
  * MERGEABLE `Aggregator` — the deterministic-memory heavy-hitter sketch
  * alongside the engine's count-min (q81, which answers point estimates
  * but can't enumerate candidates) and KMV (q105, cardinality not
  * frequency). The summary keeps at most K−1 counters; the classical
  * update decrements every counter when a new item arrives at a full
  * buffer, and the MERGE follows the mergeable-summaries rule (Agarwal,
  * Cormode et al., PODS '12): add counters pointwise, and if more than
  * K−1 survive, subtract the K-th largest count from all and drop the
  * non-positives. Under any merge tree the summary GUARANTEES:
  *
  *   - every item with true frequency > N/K is present (the superset
  *     property — no false negatives), and
  *   - each kept counter undercounts its item by at most N/K.
  *
  * The candidate SET can depend on partitioning (ties evict
  * arbitrarily), so q166 never outputs the sketch directly: candidates
  * (≤ K−1, a bounded driver read) are re-counted EXACTLY in a second
  * filtered pass and thresholded at count·K > N — by the superset
  * property that two-pass result is the exact heavy-hitter set, fully
  * deterministic and oracle-checkable, at any data size. Per-partition
  * state is K−1 counters; the shuffle carries ≤ K−1 (id, count) pairs
  * per partial regardless of input rows.
  */
object MisraGriesAgg extends Aggregator[Long, Map[Long, Long], Seq[Long]] {
  val K = 128

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], x: Long): Map[Long, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < K - 1 => buf.updated(x, 1L)
      case None =>
        // decrement-all: the arriving item and one unit of every counter
        // annihilate (K distinct items each lose one occurrence)
        buf.iterator.collect {
          case (k, c) if c > 1 => (k, c - 1)
        }.toMap
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long])
      : Map[Long, Long] = {
    val sum = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= K - 1) sum
    else {
      // subtract the K-th largest counter from all, drop non-positives —
      // at most K−1 counters can exceed it, so the result fits
      val m = sum.valuesIterator.toArray.sortInPlace()(
        Ordering[Long].reverse).apply(K - 1)
      sum.iterator.collect {
        case (k, c) if c > m => (k, c - m)
      }.toMap
    }
  }

  /** Candidate ids, sorted for a stable (if partitioning-dependent)
    * presentation; consumers re-count exactly before thresholding. */
  override def finish(buf: Map[Long, Long]): Seq[Long] =
    buf.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
