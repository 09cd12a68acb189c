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
  *
  * Construction-time actions: a QueryDef's `fn` normally just DECLARES a
  * plan, but genuinely multi-pass algorithms (q166's sketch→recount, the
  * q19 sizing probe) run their bounded pass-1 aggregate EAGERLY inside
  * `fn` — constructing the frame executes that job, and the pass-1
  * snapshot is captured at construction, not at the returned frame's
  * execution (two non-atomic reads of the source; fine for immutable
  * fixture parquet, worth knowing for timing harnesses and mutating
  * sources). Bench therefore times fn-construction + execution together.
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

/** Shared text-expression fragments used by more than one query module —
  * single definition so semantics can't drift between the dedup pipeline
  * and the fingerprinting path. */
object TextExprs {
  /** Rolling 3-token shingles over a tokens column. Guarded for <3 tokens:
    * Spark's sequence(0, n) runs DESCENDING when n < 0, which would index
    * toks[-1] — an error under ANSI mode (Spark 4 default). */
  def shingles3(toksCol: String): String =
    s"""CASE WHEN size($toksCol) >= 3 THEN
       |  transform(sequence(0, size($toksCol) - 3),
       |    i -> concat_ws(' ', $toksCol[i], $toksCol[i+1], $toksCol[i+2]))
       |ELSE array() END""".stripMargin
}
