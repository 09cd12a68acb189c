package graft.queries

import graft.Tables
import graft.ingest.Ingest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch exercise of the reference's ingest chain (SURVEY.md §2.1 F1–F5,
  * §7.2): the `events` fixture plays the MQTT firehose — `event_type` is
  * the sensor name, `user_id` the device, `props`/`value` the payload.
  *
  * A deterministic mix of payload shapes covers every reference code path:
  * numeric value (→ Float64), string value (→ String), missing "value" key
  * (reject, message.go:72-75), boolean value (reject, message.go:112-118),
  * and malformed topics (reject, message.go:38-47).
  */
object IngestQueries {

  /** Synthesized (event_id, topic, payload) stream, shared by q20–q22. */
  def mqttFrame(s: SparkSession, d: String): DataFrame = {
    val goodTopic = concat(
      lit("/client"), (col("user_id") % 3).cast("string"),
      lit("/device"), col("user_id").cast("string"),
      lit("/out/sensors/"), col("event_type"))
    Tables.events(s, d)
      .withColumn("topic",
        when(col("event_id") % 11 === 0, substring(goodTopic, 2, 1000000))
          .otherwise(goodTopic))
      .withColumn("payload",
        when(col("event_id") % 7 === 0, col("props"))
          .when(col("event_id") % 7 === 1,
            concat(lit("{\"value\":\""), col("event_type"), lit("\"}")))
          .when(col("event_id") % 7 === 2,
            concat(lit("{\"timestamp\":\"2024-01-01T00:00:00Z\",\"value\":"),
              col("value").cast("string"), lit("}")))
          .when(col("event_id") % 7 === 3, lit("{\"value\":true}"))
          // nested numeric "value" + top-level string: the type regex
          // misfires to Float64 and the castability guard must reject
          // (the poison-crash path fixed in Ingest.parse)
          .when(col("event_id") % 7 === 4,
            concat(lit("{\"nested\":{\"value\":9},\"value\":\""),
              col("event_type"), lit("\"}")))
          .otherwise(concat(lit("{\"value\":"), col("value").cast("string"),
            lit("}"))))
      .select(col("event_id"), col("topic"), col("payload"))
  }

  /** SQL twin of [[mqttFrame]] (DuckDB dialect).
    *
    * Memory-lean by design (r13 VERDICT #2: the driver's q20 oracle OOMed
    * on a memory-squeezed host): no `string_split` — the per-row LIST
    * allocations were the only heap-heavy primitive in this chain — and
    * each layer carries only the columns the next one reads (the wide
    * `payload`/`topic` strings drop out of `full_rec`). Topic fields come
    * from scalar regexp_extract instead of a materialized parts list:
    * `tableName` = last segment, `client`/`device` = 1st/2nd segment of a
    * leading-slash topic (valid rows always have one), and the ≥5-parts
    * arity check is a slash COUNT (len(parts) >= 5 ⟺ count('/') >= 4). */
  private val mqttSql =
    """WITH src AS (
      |  SELECT event_id,
      |    CASE WHEN event_id % 11 = 0 THEN substring(good_topic, 2)
      |         ELSE good_topic END AS topic,
      |    CASE
      |      WHEN event_id % 7 = 0 THEN props
      |      WHEN event_id % 7 = 1 THEN '{"value":"' || event_type || '"}'
      |      WHEN event_id % 7 = 2 THEN '{"timestamp":"2024-01-01T00:00:00Z","value":' || CAST("value" AS VARCHAR) || '}'
      |      WHEN event_id % 7 = 3 THEN '{"value":true}'
      |      WHEN event_id % 7 = 4 THEN '{"nested":{"value":9},"value":"' || event_type || '"}'
      |      ELSE '{"value":' || CAST("value" AS VARCHAR) || '}'
      |    END AS payload
      |  FROM (SELECT event_id, props, "value", event_type,
      |          '/client' || CAST(user_id % 3 AS VARCHAR) ||
      |            '/device' || CAST(user_id AS VARCHAR) ||
      |            '/out/sensors/' || event_type AS good_topic
      |        FROM events)),
      |parsed AS (
      |  SELECT event_id, topic, payload,
      |    (starts_with(topic, '/')
      |      AND len(topic) - len(replace(topic, '/', '')) >= 4) AS topic_ok,
      |    CASE
      |      WHEN regexp_matches(payload, '"value"\s*:\s*-?(\d|\.\d)') THEN 'Float64'
      |      WHEN regexp_matches(payload, '"value"\s*:\s*"') THEN 'String'
      |      ELSE NULL END AS value_type,
      |    json_extract_string(payload, '$.value') AS value_raw
      |  FROM src),
      |full_rec AS (
      |  SELECT event_id,
      |    regexp_extract(topic, '([^/]*)$', 1) AS tableName,
      |    regexp_extract(topic, '^/([^/]*)', 1) AS client,
      |    regexp_extract(topic, '^/[^/]*/([^/]*)', 1) AS device,
      |    value_type,
      |    CASE WHEN value_type = 'Float64' THEN TRY_CAST(value_raw AS DOUBLE) END AS value_d,
      |    CASE WHEN value_type = 'String' THEN value_raw END AS value_s,
      |    (topic_ok AND value_type IS NOT NULL AND value_raw IS NOT NULL
      |      AND (value_type <> 'Float64'
      |           OR TRY_CAST(value_raw AS DOUBLE) IS NOT NULL)) AS valid
      |  FROM parsed)
      |""".stripMargin

  // ------------------------------------------------------------- q20
  // Flagship: the full F1–F5 chain, valid records only.
  private val q20 = QueryDef.of(
    (s, d) => {
      val withId = Ingest.parse(mqttFrame(s, d)).filter(col("valid"))
        .select(col("event_id"), col("tableName"), col("client"),
          col("device"), col("value_type"), col("value_d"), col("value_s"))
      withId.orderBy(col("event_id"))
    },
    mqttSql +
      """SELECT event_id, tableName, client, device, value_type, value_d, value_s
        |FROM full_rec WHERE valid
        |ORDER BY event_id""".stripMargin)

  // ------------------------------------------------------------- q21
  // The router's driver-side histogram (W2): per-(table, type) counts.
  private val q21 = QueryDef.of(
    (s, d) => Ingest.records(mqttFrame(s, d))
      .groupBy(col("tableName"), col("value_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("tableName"), col("value_type")),
    mqttSql +
      """SELECT tableName, value_type, COUNT(*) AS n
        |FROM full_rec WHERE valid
        |GROUP BY tableName, value_type
        |ORDER BY tableName, value_type""".stripMargin)

  // ------------------------------------------------------------- q22
  // Rejected-rows side output (deviation from the reference's
  // poison-message halt): reason histogram.
  private val q22 = QueryDef.of(
    (s, d) => Ingest.rejected(mqttFrame(s, d))
      .groupBy(col("reason"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("reason")),
    mqttSql +
      """SELECT CASE
        |    WHEN NOT topic_ok THEN 'invalid_topic'
        |    WHEN NOT contains(payload, '"value"') THEN 'missing_value'
        |    WHEN value_type IS NULL THEN 'unsupported_value_type'
        |    ELSE 'null_value' END AS reason,
        |  COUNT(*) AS n
        |FROM (SELECT topic_ok, payload, value_type, value_raw,
        |        (topic_ok AND value_type IS NOT NULL AND value_raw IS NOT NULL
        |          AND (value_type <> 'Float64'
        |               OR TRY_CAST(value_raw AS DOUBLE) IS NOT NULL)) AS valid
        |      FROM parsed)
        |WHERE NOT valid
        |GROUP BY 1
        |ORDER BY reason""".stripMargin)

  val defs: Map[String, QueryDef] = Map(
    "q20_ingest_records" -> q20,
    "q21_ingest_route_histogram" -> q21,
    "q22_ingest_rejected" -> q22)
}
