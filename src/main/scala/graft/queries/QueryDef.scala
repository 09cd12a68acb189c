package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-contract query: the Spark plan plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver hash-compares against
  * (SparkEntry contract in the builder brief).
  *
  * Oracle-determinism rules used throughout this repo:
  *  - Sums/avgs over double columns go through exact DECIMAL arithmetic in
  *    BOTH engines, then cast to double — bit-identical regardless of
  *    aggregation order (doubles summed in different orders are not).
  *  - Every query ends in a total ORDER BY (all-column tiebreak) so row
  *    order matches even if the driver compares ordered.
  *  - Sort keys are made non-null (COALESCE) because Spark defaults ASC
  *    NULLS FIRST while DuckDB defaults NULLS LAST.
  *  - Timestamps are output as DATE or formatted strings, never raw
  *    timestamps, to dodge µs/ns + UTC-adjustment representation skew.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def of(fn: (SparkSession, String) => DataFrame, sql: String): QueryDef =
    QueryDef(fn, Some(sql))
  def noOracle(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(fn, None)
}
