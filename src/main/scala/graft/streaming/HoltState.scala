package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.Dataset

/** Streaming twin of q156's Holt linear-trend forecast: per-key
  * (level, trend) registers maintained in the state store via
  * `flatMapGroupsWithState`, advanced by the identical integer
  * recurrence (α = β = 1/2 exact halving):
  *
  *   l' = (y·1e6 + l + t) div 2,  t' = ((l' − l) + t) div 2
  *
  * so a stream that delivers the same hour-ordered points produces the
  * same registers bit-for-bit as the batch fold — the batch/stream
  * parity contract `StreamingHoltSpec` pins. Input contract: per key,
  * points arrive in hour order ACROSS batches (an hourly-rollup
  * upstream — e.g. a watermarked tumbling count — emits exactly that);
  * within a batch the iterator is sorted defensively, and late or
  * duplicate hours (hr ≤ last seen) are dropped rather than folded out
  * of order, because the recurrence is order-sensitive by definition.
  *
  * Scale shape: state is 4 longs per key, updates are pure integer
  * arithmetic, and the state store partitions by key — the standard
  * horizontally-scaling keyed-state layout (same as [[SensorStats]]).
  */
object HoltState {

  final case class HoltPoint(eventType: String, hr: Long, y: Long)
  final case class HoltModel(n: Long, lastHr: Long, l: Long, t: Long)
  final case class HoltUpdate(event_type: String, n_hours: Long,
      level_micro: Long, trend_micro: Long, fc1_micro: Long)

  def run(points: Dataset[HoltPoint]): Dataset[HoltUpdate] = {
    import points.sparkSession.implicits._
    points.groupByKey(_.eventType)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[HoltPoint],
            state: GroupState[HoltModel]) =>
          // (hr, y) tie-break: same-hour duplicates are off-contract
          // (only the first in order is folded, the rest are dropped by
          // the hr > lastHr guard), but WHICH one wins must not depend
          // on iterator order or replayed state silently diverges
          val sorted = rows.toSeq.sortBy(p => (p.hr, p.y))
          if (sorted.isEmpty) Iterator.empty
          else {
            var m = state.getOption
              .getOrElse(HoltModel(0L, Long.MinValue, 0L, 0L))
            sorted.foreach { p =>
              if (p.hr > m.lastHr) {
                if (m.n == 0L) m = HoltModel(1L, p.hr, p.y * 1000000L, 0L)
                else {
                  val l2 = (p.y * 1000000L + m.l + m.t) / 2
                  val t2 = ((l2 - m.l) + m.t) / 2
                  m = HoltModel(m.n + 1, p.hr, l2, t2)
                }
              }
            }
            state.update(m)
            Iterator.single(
              HoltUpdate(key, m.n, m.l, m.t, m.l + m.t))
          }
      }
  }
}
