package graft.sinks

/** Out-of-band maintenance for a [[ManifestCatalog]] warehouse: streaming
  * appends produce one part file per table per micro-batch, so a
  * long-running stream accumulates thousands of small files per table —
  * the classic lakehouse small-files problem at 100 TB.
  *
  * This is deliberately a SEPARATE job from the ingest stream (the same
  * split as the IVF/LSH index builds): compaction cost grows with table
  * size, so running it inside `foreachBatch` would stall the stream.
  * [[ManifestCatalog.compact]] is online-safe — readers holding the old
  * snapshot keep reading the old files, the stream keeps appending new
  * versions — so the maintenance job needs no coordination beyond the
  * single-writer manifest commit it already goes through. A production
  * deployment runs [[run]] on a schedule (or after every N batches from
  * a driver-side hook); vacuum's grace requirement (no reader older than
  * the compaction) is the operator's only contract.
  */
object ManifestMaintenance {

  final case class Report(compacted: Seq[String], reclaimedFiles: Int)

  /** Compact every table whose committed file count exceeds
    * `maxFilesPerTable` down to `targetFiles`, then vacuum unreachable
    * data files and folded log versions. Idempotent; safe to run while
    * the stream appends — `vacuumRetentionMs` (mtime grace window)
    * keeps the concurrent stream's staged-but-uncommitted parts and any
    * pinned reader's recently compacted-away files out of reach. */
  def run(catalog: ManifestCatalog, maxFilesPerTable: Int = 16,
      targetFiles: Int = 4,
      vacuumRetentionMs: Long = ManifestCatalog.DefaultVacuumRetentionMs)
      : Report = {
    val compacted = catalog.listTables().filter { t =>
      catalog.fileCount(t) > maxFilesPerTable
    }
    compacted.foreach(catalog.compact(_, targetFiles))
    Report(compacted, catalog.vacuum(vacuumRetentionMs))
  }
}
