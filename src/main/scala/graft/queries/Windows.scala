package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` stream table, run in batch mode
  * (the identical expressions run under `readStream` + `withWatermark` in
  * graft.streaming — Spark's batch/streaming unification means one
  * definition serves both; the streaming specs cover the stateful path).
  *
  * The reference discards event time entirely
  * (/root/reference/message/message.go:72-83 extracts only "value"), so
  * windowing is engine surface per the north star (SURVEY.md §2.2).
  *
  * Window bounds are output as formatted strings — raw timestamps would
  * expose µs-vs-ns physical-representation skew between engines.
  */
object Windows {

  private val fmt = "yyyy-MM-dd HH:mm:ss"

  // ------------------------------------------------------------- q23
  // Tumbling 1-hour windows per event_type: the canonical streaming agg.
  // At scale: partial aggregation map-side, shuffle keyed on
  // (window, event_type) — no skew (time advances), AQE coalesces.
  private val q23 = QueryDef.of(
    (s, d) => Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), fmt).as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour_start"), col("event_type")),
    """SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS hour_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, event_type
      |ORDER BY hour_start, event_type""".stripMargin)

  // ------------------------------------------------------------- q24
  // Session windows (30-minute inactivity gap) per user. Spark semantics:
  // a session's end is last-event + gap; an event landing exactly at the
  // boundary starts a NEW session (windows must overlap to merge), hence
  // the `>=` in the oracle's gap test.
  private val q24 = QueryDef.of(
    (s, d) => Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double")
          .as("sum_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), fmt).as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start")),
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, "value" FROM events),
      |flagged AS (
      |  SELECT user_id, ts, "value",
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sessions AS (
      |  SELECT user_id, ts, "value",
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM flagged)
      |SELECT user_id,
      |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin)

  val defs: Map[String, QueryDef] = Map(
    "q23_tumbling_hourly" -> q23,
    "q24_session_windows" -> q24)
}
