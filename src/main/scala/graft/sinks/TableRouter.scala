package graft.sinks

import graft.registry.{ColumnDef, SchemaRegistry}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-batch routing outcome (observability; the reference logs and dies
  * instead — /root/reference/main.go:21-31). `alreadyCommitted` = this
  * batch id was appended by a previous run (crash replay) and was skipped
  * — side outputs must not re-append either. */
final case class RouteStats(
    appended: Map[String, Long],
    rejectedSchema: Map[String, Long],
    alreadyCommitted: Boolean = false)

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
final class TableRouter(registry: SchemaRegistry, catalog: TableCatalog,
    appendParallelism: Int = 4,
    schemaRejectSink: Option[DataFrame => Unit] = None) {

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
    * [[graft.ingest.Ingest.records]]).
    *
    * With `batchId >= 0` (streaming), replayed batches the catalog has
    * already committed are skipped — effectively-once appends across
    * query restarts for catalogs that record commits. */
  def routeBatch(batch: DataFrame, batchId: Long = -1L): RouteStats = {
    if (batchId >= 0 && catalog.batchCommitted(batchId))
      return RouteStats(Map.empty, Map.empty, alreadyCommitted = true)
    val recs = batch.persist()
    try {
      // (tableName, value_type) -> count; tiny, driver-side by design.
      val hist = recs.groupBy("tableName", "value_type").count()
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2))

      val appended = scala.collection.mutable.Map.empty[String, Long]
      val rejected = scala.collection.mutable.Map.empty[String, Long]
      val appendTasks = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, String, Long)] // (table, vt, valueCol, n)

      // Phase 1 (serial, driver): DDL + schema decisions — cheap,
      // order-sensitive (first sight fixes the schema).
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
                  if (tableType == "String") "value_s" else "value_d"
                appendTasks += ((table, vt, valueCol, n))
              case Some(_) =>
                rejected(table) = rejected.getOrElse(table, 0L) + n
            }
          }
      }

      // Phase 2: appends. Fast path — ONE dynamic-partitioned write job
      // per value type (validated tasks always have vt == table type, so
      // there are at most 2 groups), covering every table in the slice.
      // Catalogs without a routed write (JDBC) fall back to bounded-
      // parallel per-table jobs.
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val byType = appendTasks.toSeq.groupBy(t => (t._2, t._3)).toSeq
        .sortBy(_._1)
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(math.max(1, appendParallelism))
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      try {
        val futures = byType.map { case ((vt, valueCol), tasks) =>
          Future {
            val tables = tasks.map(_._1)
            val routedDf = recs
              .filter(col("value_type") === vt &&
                col("tableName").isInCollection(tables))
              .select(col("tableName"), col("client"), col("device"),
                col(valueCol).as("value"))
            val handled = catalog.appendRouted(routedDf, tables)
            if (!handled) tasks.foreach { case (table, _, _, _) =>
              catalog.append(table,
                recs.filter(col("tableName") === table &&
                    col("value_type") === vt)
                  .select(col("client"), col("device"),
                    col(valueCol).as("value")))
            }
            appended.synchronized {
              tasks.foreach { case (table, _, _, n) =>
                appended(table) = appended.getOrElse(table, 0L) + n
              }
            }
          }
        }
        Await.result(Future.sequence(futures), Duration.Inf)
      } finally pool.shutdown()

      // schema-mismatched slices go to the configured side output —
      // "rejected" must mean visible, not silently counted away
      if (rejected.nonEmpty) schemaRejectSink.foreach { sink =>
        val mismatchKeys = hist.filter { case (table, vt, _) =>
          registry.get(table).exists(cols =>
            registry.checkValid(cols, colsFor(vt)).isDefined)
        }.map { case (table, vt, _) => (table, vt) }
        val cond = mismatchKeys.map { case (t, vt) =>
          col("tableName") === t && col("value_type") === vt
        }.reduce(_ || _)
        sink(recs.filter(cond))
      }

      if (batchId >= 0) catalog.commitBatch(batchId)
      RouteStats(appended.synchronized(appended.toMap), rejected.toMap)
    } finally { recs.unpersist(); () }
  }
}
