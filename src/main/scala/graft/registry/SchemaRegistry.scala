package graft.registry

import graft.ingest.TypeMapping
import org.apache.spark.sql.types._

/** One column of a routed table, carrying the ClickHouse type name the
  * reference works in (`ColumnsType{ColName, ColType}`,
  * /root/reference/message/message.go:26-29). */
final case class ColumnDef(name: String, chType: String) {
  /** Spark view of the column — read-side family mapping (a bootstrap
    * table created outside the ingest path can carry DateTime64 /
    * Decimal / sized-int columns; [[TypeMapping.toSparkRead]]). Fails
    * loudly on a genuinely unrepresentable type instead of a bare
    * NoSuchElementException. */
  def sparkType: DataType = TypeMapping.toSparkRead(chType).getOrElse(
    throw new IllegalArgumentException(
      s"no Spark type for ClickHouse '$chType' (column '$name')"))
  def sparkField: StructField = StructField(name, sparkType)
}

/** Driver-side schema catalog — the engine's version of the reference's
  * `tablesInfo map[string][]ColumnsType` cache (/root/reference/db/db.go:15,
  * :18-22).
  *
  * The reference guards the map with a `sync.RWMutex` because the consumer
  * goroutine and bootstrap race; here all mutation happens on the driver
  * inside `foreachBatch` (serial per streaming query), so a plain map +
  * `synchronized` for the multi-query case suffices (SURVEY.md §4.2).
  */
final class SchemaRegistry {
  private val tables = scala.collection.mutable.Map.empty[String, Seq[ColumnDef]]

  def contains(table: String): Boolean = synchronized(tables.contains(table))
  def get(table: String): Option[Seq[ColumnDef]] = synchronized(tables.get(table))
  def put(table: String, cols: Seq[ColumnDef]): Unit =
    synchronized { tables.update(table, cols) }
  def tableNames: Seq[String] = synchronized(tables.keys.toSeq.sorted)

  def sparkSchema(table: String): Option[StructType] =
    get(table).map(cols => StructType(cols.map(_.sparkField)))

  /** W3 — positional schema-compatibility check, faithful to the reference:
    * same column count and same type string at each index; column NAMES are
    * never compared (/root/reference/db/db.go:208-223). Returns an error
    * message or None if compatible. */
  def checkValid(expected: Seq[ColumnDef], incoming: Seq[ColumnDef])
      : Option[String] =
    if (expected.length != incoming.length)
      Some(s"column count mismatch: table has ${expected.length}, " +
        s"record has ${incoming.length}")
    else expected.zip(incoming).zipWithIndex.collectFirst {
      case ((e, i), idx) if e.chType != i.chType =>
        s"type mismatch at position $idx: table ${e.chType}, record ${i.chType}"
    }
}
