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

  // ------------------------------------------------------------- q25
  // As-of join: each purchase matched to the user's most recent view at
  // or before it. Spark lacks a native as-of join; rather than a custom
  // SparkStrategy (SURVEY.md §7.3: none needed), this composes as a
  // tagged union + running last-value window — ONE shuffle on user_id,
  // no join at all, which beats a range-join at any scale. The DuckDB
  // oracle uses its native ASOF JOIN, independently validating the
  // composition's semantics (ties: a view at the exact purchase
  // timestamp matches, hence is_view DESC in the sort).
  private val q25 = QueryDef.of(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d)
      val tagged = e.filter(col("event_type").isin("view", "purchase"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"),
          (col("event_type") === "view").cast("int").as("is_view"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_view").desc, col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_view_ts",
          max(when(col("is_view") === 1, col("ts"))).over(w))
        .filter(col("event_type") === "purchase" &&
          col("last_view_ts").isNotNull)
        .select(col("event_id"),
          col("user_id"),
          date_format(col("last_view_ts"), fmt).as("view_ts"),
          (unix_micros(col("ts")) - unix_micros(col("last_view_ts")))
            .as("gap_us"))
        .orderBy(col("event_id"))
    },
    """WITH p AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE event_type = 'view')
      |SELECT p.event_id, p.user_id,
      |  strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
      |  epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
      |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY event_id""".stripMargin)

  // ------------------------------------------------------------- q27
  // Analytic functions: lag/lead/ntile per user event sequence.
  private val q27 = QueryDef.of(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("delta", col("value") - lag(col("value"), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .withColumn("quartile", ntile(4).over(w))
        .select(col("event_id"), col("user_id"), col("delta"),
          col("next_type"), col("quartile"))
        .orderBy(col("event_id"))
    },
    """SELECT event_id, user_id,
      |  "value" - LAG("value", 1) OVER w AS delta,
      |  LEAD(event_type, 1) OVER w AS next_type,
      |  NTILE(4) OVER w AS quartile
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |ORDER BY event_id""".stripMargin)

  // ------------------------------------------------------------- q28
  // Range-frame window: trailing-1-hour event count and value sum per
  // user — the "sliding aggregate per row" shape, expressed as a RANGE
  // frame over epoch-µs (one shuffle on user_id, no self-join).
  private val q28 = QueryDef.of(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-3600000000L, 0L)
      Tables.events(s, d)
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h",
          sum(col("value").cast("decimal(12,2)")).over(w)
            .cast("double"))
        .select(col("event_id"), col("user_id"), col("n_1h"), col("sum_1h"))
        .orderBy(col("event_id"))
    },
    """SELECT event_id, user_id,
      |  COUNT(*) OVER w AS n_1h,
      |  CAST(SUM(CAST("value" AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin)

  // ------------------------------------------------------------- q36
  // Interval (band) self-join: ordered event pairs of the same user
  // within 5 minutes. NOT the naive same-user join + band filter (pairs
  // within a user grow quadratically with density — dies at 100×): one
  // side is exploded to its 3 candidate 5-min buckets and the join is
  // EQUI on (user_id, bucket), so the shuffle key granularity bounds
  // each comparison group to two adjacent buckets regardless of scale.
  // A qualifying pair (|Δt| ≤ gap ⇒ buckets differ by ≤ 1) is discovered
  // exactly once since the candidate buckets are distinct.
  private val q36 = QueryDef.of(
    (s, d) => {
      val gapUs = 300000000L
      val e = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("tus"))
      val a = e.select(col("user_id"), col("event_id").as("id1"),
        col("tus").as("t1"))
        .withColumn("bucket", expr(s"t1 div $gapUs"))
      val b = e.select(col("user_id"), col("event_id").as("id2"),
        col("tus").as("t2"))
        .withColumn("bucket", explode(expr(
          s"array(t2 div $gapUs - 1, t2 div $gapUs, t2 div $gapUs + 1)")))
      a.join(b, Seq("user_id", "bucket"))
        .filter(col("id1") < col("id2") &&
          abs(col("t2") - col("t1")) <= gapUs)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    },
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS tus
      |  FROM events)
      |SELECT a.user_id, COUNT(*) AS n_pairs
      |FROM e a JOIN e b
      |  ON a.user_id = b.user_id AND a.event_id < b.event_id
      |  AND abs(b.tus - a.tus) <= 300000000
      |GROUP BY a.user_id
      |ORDER BY a.user_id""".stripMargin)

  // ------------------------------------------------------------- q83
  // Sliding windows (2-hour size, 1-hour slide) — the third windowing
  // mode beside tumbling (q23) and session (q24); each event lands in
  // exactly size/slide = 2 windows. Same plan shape as tumbling (the
  // window() expression explodes to window instances BEFORE the
  // aggregate, so partial aggregation still applies); the oracle
  // materializes each event's two covering windows explicitly — epoch
  // alignment makes them hour-floor and hour-floor minus one hour.
  private val q83 = QueryDef.of(
    (s, d) => Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), fmt).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type")),
    """WITH e AS (
      |  SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, "value" FROM events),
      |w AS (
      |  SELECT date_trunc('hour', ts) - o.o * INTERVAL 1 HOUR AS win_start,
      |    event_type, "value"
      |  FROM e CROSS JOIN (VALUES (0), (1)) o(o))
      |SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST("value" AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM w GROUP BY 1, 2
      |ORDER BY win_start, event_type""".stripMargin)

  val defs: Map[String, QueryDef] = Map(
    "q23_tumbling_hourly" -> q23,
    "q83_sliding_windows" -> q83,
    "q24_session_windows" -> q24,
    "q25_asof_join" -> q25,
    "q27_lag_lead_ntile" -> q27,
    "q28_range_frame" -> q28,
    "q36_interval_join" -> q36)
}
