package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Streaming funnel: the per-user ordered-stage machine behind q90
  * (signup → click ≤7d → purchase ≤7d), run as arbitrary keyed state on
  * the live event stream instead of a batch query. Spark's
  * batch/streaming unification means the TRANSITION RULES are shared
  * semantics; `FunnelStateSpec` pins streaming output ≡ q90's batch
  * result for in-order delivery — the invariant that lets a dashboard
  * consume the streaming view while nightly batch recomputes it.
  *
  * State per user is three optional stage timestamps (~40 bytes); the
  * state store partitions by user key, so this scales horizontally with
  * users, exactly like the batch query's user-keyed shuffles. Events
  * inside a micro-batch are sorted by (ts, event_id) before folding —
  * Spark hands the group iterator in arbitrary order. Out-of-order
  * delivery ACROSS batches follows at-arrival semantics (a late signup
  * does not retroactively re-qualify an earlier click; the batch query
  * is the reconciliation path — documented trade-off, same as every
  * streaming funnel).
  */
object FunnelState {

  private val WindowMicros = 7L * 24 * 3600 * 1000000L

  final case class FunnelStage(signupUs: Option[Long], clickUs: Option[Long],
      purchaseUs: Option[Long]) {
    def stage: Int = 1 + clickUs.size + purchaseUs.size
  }
  final case class StageUpdate(user_id: Long, stage: Int,
      signup_at: Timestamp, click_at: Option[Timestamp],
      purchase_at: Option[Timestamp])

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  /** Fold one event into the stage machine (shared transition rules). */
  private[streaming] def step(st: FunnelStage, eventType: String,
      us: Long): FunnelStage = eventType match {
    case "signup" if st.signupUs.forall(us < _) =>
      // earliest signup wins; later stages only survive if they still
      // qualify against the new anchor (they can't — they'd predate it
      // only if out-of-order, handled by at-arrival semantics)
      FunnelStage(Some(us), st.clickUs, st.purchaseUs)
    case "click" if st.signupUs.exists(s =>
        us > s && us <= s + WindowMicros) && st.clickUs.isEmpty =>
      st.copy(clickUs = Some(us))
    case "purchase" if st.clickUs.exists(c =>
        us > c && us <= c + WindowMicros) && st.purchaseUs.isEmpty =>
      st.copy(purchaseUs = Some(us))
    case _ => st
  }

  /** events: (user_id long, event_type string, ts timestamp) — streaming
    * or batch. Emits a row whenever a user's stage ADVANCES. */
  def track(events: DataFrame): Dataset[StageUpdate] = {
    import events.sparkSession.implicits._
    events.select($"user_id", $"event_type", $"ts")
      .as[(Long, String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String, Timestamp)],
            state: GroupState[FunnelStage]) =>
          val prev = state.getOption.getOrElse(FunnelStage(None, None, None))
          // group iterators are unordered; replay the batch in event-time
          val next = rows.toSeq
            .sortBy { case (_, _, t) => (micros(t), 0) }
            .foldLeft(prev) { case (st, (_, et, t)) => step(st, et, micros(t)) }
          if (next == prev) Iterator.empty
          else {
            state.update(next)
            Iterator.single(StageUpdate(user, next.stage,
              toTs(next.signupUs.getOrElse(Long.MinValue)),
              next.clickUs.map(toTs), next.purchaseUs.map(toTs)))
          }
      }
  }
}
