package graft.ingest

import org.apache.spark.sql.types._

/** Bijection between Spark `DataType`s and the reference's ClickHouse type
  * names.
  *
  * The reference maps Go dynamic types to ClickHouse type strings in
  * `createColumnDesc` (/root/reference/message/message.go:97-125): `int` →
  * "Int", `float64` → "Float64", `string` → "String", everything else
  * rejected. Because Go's encoding/json decodes every JSON number to
  * `float64`, the live surface is {Float64, String} plus Int64 kept for the
  * declared-but-dead `int` branch (SURVEY.md §1.2).
  */
object TypeMapping {
  /** ClickHouse type name → Spark type. */
  val toSpark: Map[String, DataType] = Map(
    "Float64" -> DoubleType,
    "String"  -> StringType,
    "Int64"   -> LongType,
    // the reference's (unreachable) spelling for Go `int`
    "Int"     -> LongType)

  /** Spark type → canonical ClickHouse type name. */
  val toClickHouse: Map[DataType, String] = Map(
    DoubleType -> "Float64",
    StringType -> "String",
    LongType   -> "Int64")

  /** Is this Spark type ingestable under reference semantics?
    * (bool/null/array/object are rejected —
    * /root/reference/message/message.go:112-118). */
  def supported(dt: DataType): Boolean = toClickHouse.contains(dt)
}
