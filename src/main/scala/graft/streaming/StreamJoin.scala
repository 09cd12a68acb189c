package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the attribution primitive
  * (impressions ⋈ clicks within a lag window) and the last piece of the
  * streaming operator surface beside windows/session/stateful/dedup/CDC.
  * The batch twin of this shape is q36's interval join; here BOTH sides
  * are unbounded streams.
  *
  * Semantics (Structured Streaming's standard bounded-state contract):
  * a right row matches a left row with the same key when it lands inside
  * `[leftTs, leftTs + maxLag]`. Each side carries an event-time
  * watermark; the interval condition plus the watermarks let Spark prove
  * when a buffered row can no longer match — left state is evictable
  * once the right watermark passes `leftTs + maxLag`, right state once
  * the left watermark passes `rightTs`. That proof is what bounds state
  * at 100 TB/day: without the time-range predicate a stream-stream join
  * buffers both streams forever.
  *
  * `left_outer` adds the attribution "no click" rows: an unmatched left
  * row is emitted with nulled right columns only after the watermark
  * closes its match window (correct, late — the price of exactness on
  * streams).
  *
  * Scale shape: the join keys on `key`, so both streams shuffle once
  * onto the same key partitioning; state store size ≈ key cardinality ×
  * window seconds × arrival rate, independent of stream length.
  *
  * Reference scope note: the reference pipeline (SURVEY.md §2.1) has no
  * joins at all — this is engine-surface (§2.2 joins × streaming), built
  * purely from Spark's own stream-stream join machinery.
  */
object StreamJoin {

  /** Interval-join two event-time streams on `key`.
    *
    * @param left       left stream; columns include `key` and `leftTs`
    * @param right      right stream; columns include `key` and `rightTs`
    * @param key        equality join column present on both sides
    * @param leftTs     left event-time column (watermarked here)
    * @param rightTs    right event-time column (watermarked here)
    * @param maxLag     interval literal, e.g. "30 seconds": right must
    *                   land in [leftTs, leftTs + maxLag]
    * @param watermark  max event-time disorder tolerated per side
    * @param joinType   "inner" or "left_outer"
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      maxLag: String,
      watermark: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(
      r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $maxLag"),
      joinType)
      .drop(r(key))
  }
}
