package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Remaining scalar-function coverage: structured JSON parsing
  * (`from_json`), array higher-order functions over embeddings, and date
  * arithmetic — each oracle-checked. */
object Extras {

  // ------------------------------------------------------------- q57
  // from_json with an explicit schema (vs q20's get_json_object path):
  // Catalyst prunes unaccessed fields from the parse, the structured
  // analog of the reference's manual extract-only-"value" pruning
  // (/root/reference/message/message.go:72-83).
  private val q57 = QueryDef.of(
    (s, d) => Tables.events(s, d)
      .withColumn("parsed", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")))
      .groupBy(col("event_type"))
      .agg(
        count(col("parsed.k")).as("n"),
        sum(col("parsed.k")).cast("bigint").as("sum_k"),
        min(col("parsed.k")).as("min_k"),
        max(col("parsed.k")).as("max_k"))
      .orderBy(col("event_type")),
    """SELECT event_type,
      |  COUNT(CAST(json_extract_string(props, '$.k') AS INT)) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin)

  // ------------------------------------------------------------- q58
  // Array scalar functions over the embedding column (size, min/max,
  // reverse, prefix fold) — scalar outputs only (float→double casts are
  // exact, so values hash-match).
  private val q58 = QueryDef.of(
    (s, d) => Tables.embeddings(s, d)
      .filter(col("vec_id") < 100)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("bigint").as("n_dims"),
        array_max(col("embedding")).cast("double").as("arr_max"),
        array_min(col("embedding")).cast("double").as("arr_min"),
        element_at(reverse(col("embedding")), 1).cast("double").as("last_val"),
        expr("aggregate(slice(embedding, 1, 3), 0D, (acc, x) -> acc + cast(x as double))")
          .as("head3_sum"))
      .orderBy(col("vec_id")),
    """SELECT vec_id,
      |  len(embedding) AS n_dims,
      |  CAST(list_max(embedding) AS DOUBLE) AS arr_max,
      |  CAST(list_min(embedding) AS DOUBLE) AS arr_min,
      |  CAST(list_reverse(embedding)[1] AS DOUBLE) AS last_val,
      |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(list_slice(embedding, 1, 3),
      |      x -> CAST(x AS DOUBLE))), (a, b) -> a + b) AS head3_sum
      |FROM embeddings
      |WHERE vec_id < 100
      |ORDER BY vec_id""".stripMargin)

  // ------------------------------------------------------------- q59
  // Date arithmetic: ship-delay (days between order and ship date)
  // bucketed by 30-day windows.
  private val q59 = QueryDef.of(
    // raw loads: first wide op is the key shuffle (see Tables.raw)
    (s, d) => Tables.raw(s, d, "lineitem")
      .join(Tables.raw(s, d, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_days",
        datediff(col("l_shipdate"), col("o_orderdate")))
      // explicit DIV: a double-divide + cast would TRUNCATE in Spark but
      // ROUND in DuckDB — integer division agrees in both
      .groupBy(expr("CAST(delay_days DIV 30 AS INT)").as("delay_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("delay_days")).as("min_delay"),
        max(col("delay_days")).as("max_delay"))
      .orderBy(col("delay_bucket")),
    """SELECT CAST(date_diff('day', o_orderdate, l_shipdate) // 30 AS INT) AS delay_bucket,
      |  COUNT(*) AS n,
      |  MIN(date_diff('day', o_orderdate, l_shipdate)) AS min_delay,
      |  MAX(date_diff('day', o_orderdate, l_shipdate)) AS max_delay
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1
      |ORDER BY delay_bucket""".stripMargin)

  // ------------------------------------------------------------- q72
  // Unpivot (wide→long): melt the lineitem measure columns into
  // (metric, value) rows — Spark's Dataset.unpivot (Expand under the
  // hood, no shuffle until the aggregate) vs DuckDB's UNPIVOT. Values go
  // through DECIMAL so the re-aggregated totals are order-independent.
  private val q72 = QueryDef.of(
    (s, d) => {
      val m = Tables.raw(s, d, "lineitem").select(
        col("l_orderkey"),
        col("l_quantity").cast("decimal(12,2)").as("quantity"),
        col("l_extendedprice").cast("decimal(12,2)").as("extendedprice"),
        col("l_discount").cast("decimal(12,2)").as("discount"))
      m.unpivot(
        Array(col("l_orderkey")),
        Array(col("quantity"), col("extendedprice"), col("discount")),
        "metric", "value")
        .groupBy(col("metric"))
        .agg(sum(col("value")).cast("double").as("total"),
          count(lit(1)).as("n"))
        .orderBy(col("metric"))
    },
    """WITH m AS (
      |  SELECT l_orderkey,
      |    CAST(l_quantity AS DECIMAL(12,2)) AS quantity,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) AS extendedprice,
      |    CAST(l_discount AS DECIMAL(12,2)) AS discount
      |  FROM lineitem),
      |u AS (
      |  FROM m UNPIVOT (value FOR metric IN (quantity, extendedprice, discount)))
      |SELECT metric, CAST(SUM(value) AS DOUBLE) AS total, COUNT(*) AS n
      |FROM u
      |GROUP BY metric
      |ORDER BY metric""".stripMargin)

  val defs: Map[String, QueryDef] = Map(
    "q57_json_struct" -> q57,
    "q58_array_funcs" -> q58,
    "q59_date_arith" -> q59,
    "q72_unpivot" -> q72)
}
