package graft.sinks

import graft.registry.ColumnDef
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Physical destination for routed per-sensor tables — the engine's
  * abstraction over the reference's ClickHouse layer
  * (/root/reference/db/db.go). Implementations must be driver-side
  * idempotent: `createTable` is CREATE-IF-NOT-EXISTS, `append` is a bulk
  * (micro-batch-sized) write, never the reference's one-INSERT-per-row
  * (/root/reference/db/db.go:259-264).
  */
trait TableCatalog {
  /** W1 — list existing tables (reference `showTables`,
    * /root/reference/db/db.go:50-69). */
  def listTables(): Seq[String]
  /** W1 — existing schema of a table (reference `showColumns`; note the
    * reference's DESCRIBE is malformed, db/db.go:75 — deviation §4.3). */
  def describe(table: String): Seq[ColumnDef]
  /** W4 — auto-DDL from an inferred schema
    * (/root/reference/db/db.go:226-243). */
  def createTable(table: String, cols: Seq[ColumnDef]): Unit
  /** W5 — bulk append one micro-batch's rows for one table. */
  def append(table: String, df: DataFrame): Unit
}

/** Parquet-directory catalog: one subdirectory per sensor table. Durable
  * (unlike the reference's `engine=Memory`, /root/reference/db/db.go:233),
  * partition-parallel, and what a lakehouse deployment would use. */
final class WarehouseCatalog(spark: SparkSession, root: String)
    extends TableCatalog {
  private val rootDir = new java.io.File(root)
  rootDir.mkdirs()

  override def listTables(): Seq[String] =
    Option(rootDir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName).toSeq.sorted

  override def describe(table: String): Seq[ColumnDef] = {
    val schema: StructType =
      spark.read.parquet(s"$root/$table").schema
    schema.fields.toSeq.map { f =>
      ColumnDef(f.name, graft.ingest.TypeMapping.toClickHouse(f.dataType))
    }
  }

  override def createTable(table: String, cols: Seq[ColumnDef]): Unit = {
    // Parquet tables materialize on first append; DDL is a no-op beyond
    // the registry entry the router records.
    val _ = (table, cols)
  }

  override def append(table: String, df: DataFrame): Unit =
    df.write.mode(SaveMode.Append).parquet(s"$root/$table")

  def read(table: String): DataFrame = spark.read.parquet(s"$root/$table")
}

/** SQL-text generation for a ClickHouse (JDBC) catalog. Connection handling
  * is pluggable because no JDBC driver ships in this offline environment;
  * the SQL itself is the complete, tested surface. Identifiers are strictly
  * validated instead of string-concatenated raw (the reference is injectable
  * through the topic string — /root/reference/db/db.go:233, :259-262;
  * deviation §4.3). */
object ClickHouseSql {
  private val ident = "^[A-Za-z_][A-Za-z0-9_]*$".r

  def quoteIdent(name: String): String = name match {
    case ident() => "`" + name + "`"
    case _ => throw new IllegalArgumentException(
      s"illegal SQL identifier: '$name'")
  }

  /** Reference `createTable` (/root/reference/db/db.go:226-243) — but with
    * a durable MergeTree engine instead of `Memory` and quoted identifiers. */
  def createTable(table: String, cols: Seq[ColumnDef]): String = {
    val colSql = cols.map(c => s"${quoteIdent(c.name)} ${c.chType}")
      .mkString(", ")
    s"CREATE TABLE IF NOT EXISTS ${quoteIdent(table)} ($colSql) " +
      "ENGINE = MergeTree() ORDER BY tuple()"
  }

  /** Reference `writeData` (/root/reference/db/db.go:246-271) — same
    * parameterized INSERT shape, executed once per micro-batch with JDBC
    * `addBatch`, not once per row. */
  def insert(table: String, cols: Seq[ColumnDef]): String = {
    val names = cols.map(c => quoteIdent(c.name)).mkString(", ")
    val marks = cols.map(_ => "?").mkString(", ")
    s"INSERT INTO ${quoteIdent(table)} ($names) VALUES ($marks)"
  }

  def describeTable(table: String): String =
    s"DESCRIBE TABLE ${quoteIdent(table)}"

  val showTables: String = "SHOW TABLES"
}
