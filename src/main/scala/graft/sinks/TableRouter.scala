package graft.sinks

import graft.registry.{ColumnDef, SchemaRegistry}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-batch routing outcome (observability; the reference logs and dies
  * instead — /root/reference/main.go:21-31). */
final case class RouteStats(
    appended: Map[String, Long],
    rejectedSchema: Map[String, Long])

/** W2 — table router / demultiplexer (reference `Recording`,
  * /root/reference/db/db.go:147-205), run driver-side inside
  * `foreachBatch`:
  *
  *   - catalog hit  → W3 positional schema check against the registry;
  *     mismatching rows are counted + dropped to the rejected output
  *     (reference would kill the pipeline);
  *   - catalog miss → W4 auto-DDL with the batch-inferred schema, then
  *     registry insert;
  *   - then W5 bulk append of the typed per-table slice.
  *
  * The only driver-side collect is the per-batch `(tableName, value_type)`
  * histogram — cardinality = number of distinct sensors, thousands at most,
  * never data-sized. Row data itself moves executor-side only.
  *
  * Routed table schema is the reference's golden shape
  * `[client String, device String, value <inferred>]`
  * (/root/reference/message/message_test.go:177-198).
  */
final class TableRouter(registry: SchemaRegistry, catalog: TableCatalog) {

  /** W1 — seed the registry from the physical catalog at startup
    * (reference `LoadTables`, /root/reference/db/db.go:117-135). */
  def bootstrap(): Unit =
    catalog.listTables().foreach { t =>
      registry.put(t, catalog.describe(t))
    }

  private def colsFor(chType: String): Seq[ColumnDef] = Seq(
    ColumnDef("client", "String"),
    ColumnDef("device", "String"),
    ColumnDef("value", chType))

  /** Route one micro-batch of parsed records (output of
    * [[graft.ingest.Ingest.records]]). */
  def routeBatch(batch: DataFrame): RouteStats = {
    val recs = batch.persist()
    try {
      // (tableName, value_type) -> count; tiny, driver-side by design.
      val hist = recs.groupBy("tableName", "value_type").count()
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2))

      val appended = scala.collection.mutable.Map.empty[String, Long]
      val rejected = scala.collection.mutable.Map.empty[String, Long]

      hist.groupBy(_._1).toSeq.sortBy(_._1).foreach {
        case (table, groups) =>
          // First message for a sensor fixes its schema (reference
          // db/db.go:187-195). Within one batch arrival order is
          // undefined, so the engine picks deterministically: the most
          // frequent type, ties broken alphabetically.
          val tableType: String = registry.get(table) match {
            case Some(cols) => cols.last.chType
            case None =>
              val chosen = groups.maxBy(g => (g._3, g._2.head * -1))._2
              catalog.createTable(table, colsFor(chosen))
              registry.put(table, colsFor(chosen))
              chosen
          }
          groups.foreach { case (_, vt, n) =>
            registry.checkValid(
                registry.get(table).get, colsFor(vt)) match {
              case None =>
                val valueCol =
                  if (tableType == "String") col("value_s")
                  else col("value_d")
                catalog.append(table,
                  recs.filter(col("tableName") === table &&
                      col("value_type") === vt)
                    .select(col("client"), col("device"),
                      valueCol.as("value")))
                appended(table) = appended.getOrElse(table, 0L) + n
              case Some(_) =>
                rejected(table) = rejected.getOrElse(table, 0L) + n
            }
          }
      }
      RouteStats(appended.toMap, rejected.toMap)
    } finally { recs.unpersist(); () }
  }
}
