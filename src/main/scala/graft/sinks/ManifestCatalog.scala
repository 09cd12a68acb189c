package graft.sinks

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.registry.ColumnDef
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Commit-log (manifest) table format — the production answer to the two
  * crash windows [[WarehouseCatalog]] documents:
  *
  *  1. its appendRouted moves files THEN writes the batch marker — a
  *     crash between the last move and the marker replays the batch into
  *     duplicates;
  *  2. its compact swaps directories with two renames — a reader (or
  *     crash) inside the swap sees a missing table.
  *
  * Here data files are INVISIBLE until a manifest version commits, and a
  * commit is ONE atomic same-directory rename of a version file into
  * `_manifest/` covering every table the batch touched plus the batch id
  * — so "rows visible" and "batch committed" cannot diverge, closing
  * window 1. Compaction commits a version that REPLACES a table's file
  * list while old files stay on disk for in-flight readers (removed
  * later by [[vacuum]]), closing window 2.
  *
  * Log format (Delta-style delta log, single-writer — the streaming
  * driver): `_manifest/v<20-digit>.json`, each version holding only the
  * delta — `add` (files appended per table), `replace` (compaction), and
  * an optional `batchId`. Readers fold the log into a per-table file
  * list. At 100 TB the fold is periodically checkpointed (a `replace`
  * of every table is exactly that); the single-writer assumption is the
  * same one `foreachBatch` already provides.
  */
final class ManifestCatalog(spark: SparkSession, root: String)
    extends TableCatalog {
  private val rootDir = new File(root)
  private val manifestDir = new File(rootDir, "_manifest")
  rootDir.mkdirs()

  // ------------------------------------------------------------ log I/O

  private final case class Version(n: Long, batchId: Option[Long],
      add: Map[String, Seq[String]], replace: Map[String, Seq[String]])

  private def versionFiles(): Seq[File] =
    Option(manifestDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("v") && f.getName.endsWith(".json"))
      .sortBy(_.getName).toSeq

  // minimal JSON — the shapes are fixed and writer-controlled, so a
  // hand-rolled codec avoids a library dependency (none are available)
  private def render(v: Version): String = {
    def files(m: Map[String, Seq[String]]): String =
      m.toSeq.sortBy(_._1).map { case (t, fs) =>
        "\"" + t + "\":[" + fs.map("\"" + _ + "\"").mkString(",") + "]"
      }.mkString("{", ",", "}")
    s"""{"version":${v.n},"batchId":${v.batchId.getOrElse(-1L)},""" +
      s""""add":${files(v.add)},"replace":${files(v.replace)}}"""
  }

  private def parse(n: Long, s: String): Version = {
    def section(name: String): Map[String, Seq[String]] = {
      val m = (s""""$name":\\{(.*?)\\}""").r.findFirstMatchIn(s)
        .map(_.group(1)).getOrElse("")
      """"([^"]+)":\[([^\]]*)\]""".r.findAllMatchIn(m).map { g =>
        g.group(1) -> """"([^"]+)"""".r.findAllMatchIn(g.group(2))
          .map(_.group(1)).toSeq
      }.toMap
    }
    val bid = """"batchId":(-?\d+)""".r.findFirstMatchIn(s)
      .map(_.group(1).toLong).filter(_ >= 0)
    Version(n, bid, section("add"), section("replace"))
  }

  private def readLog(): Seq[Version] = versionFiles().map { f =>
    parse(f.getName.stripPrefix("v").stripSuffix(".json").toLong,
      new String(Files.readAllBytes(f.toPath), UTF_8))
  }

  /** Fold the delta log into the live per-table file lists. */
  private def snapshot(): Map[String, Seq[String]] =
    readLog().foldLeft(Map.empty[String, Seq[String]]) { (acc, v) =>
      val replaced = acc ++ v.replace
      v.add.foldLeft(replaced) { case (a, (t, fs)) =>
        a.updated(t, a.getOrElse(t, Nil) ++ fs)
      }
    }

  /** Atomic commit: write tmp in `_manifest/`, rename to the next
    * version. Same-directory rename is atomic on POSIX; REPLACE_EXISTING
    * is deliberately absent — colliding with an existing version (a
    * second writer) must fail, not clobber. */
  private def commitVersion(batchId: Option[Long],
      add: Map[String, Seq[String]],
      replace: Map[String, Seq[String]] = Map.empty): Unit = {
    manifestDir.mkdirs()
    val next = readLog().lastOption.map(_.n + 1).getOrElse(0L)
    val body = render(Version(next, batchId, add, replace))
    val tmp = Files.createTempFile(manifestDir.toPath, ".tmp-v", ".json")
    Files.write(tmp, body.getBytes(UTF_8))
    Files.move(tmp, manifestDir.toPath.resolve(f"v$next%020d.json"),
      StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  // ------------------------------------------------- deferred batch mode

  // Between beginBatch and commitBatch every append only STAGES file
  // moves and records the adds here; commitBatch publishes them together
  // with the batch id in one atomic rename. Guarded by `this` — the
  // router's append pool calls appendRouted concurrently.
  private val pendingAdds =
    scala.collection.mutable.Map.empty[String, Seq[String]]
  private var deferring = false

  override def beginBatch(batchId: Long): Unit = synchronized {
    // pending adds from a previous FAILED batch are dropped — their
    // part files are unreachable orphans until vacuum()
    pendingAdds.clear()
    deferring = true
  }

  /** Record adds into the open batch; false → caller commits directly. */
  private def recordPending(added: Map[String, Seq[String]]): Boolean =
    synchronized {
      if (!deferring) false
      else {
        added.foreach { case (t, fs) =>
          pendingAdds(t) = pendingAdds.getOrElse(t, Nil) ++ fs
        }
        true
      }
    }

  // -------------------------------------------------------- TableCatalog

  override def listTables(): Seq[String] = snapshot().keys.toSeq.sorted

  override def describe(table: String): Seq[ColumnDef] = {
    val schema: StructType = read(table).schema
    schema.fields.toSeq.map(f =>
      ColumnDef(f.name, graft.ingest.TypeMapping.toClickHouse(f.dataType)))
  }

  override def createTable(table: String, cols: Seq[ColumnDef]): Unit = {
    val _ = (table, cols) // tables materialize at first committed append
  }

  /** Read ONLY the files the manifest lists — uncommitted (orphaned)
    * part files in the directory are invisible by construction. */
  def read(table: String): DataFrame = {
    val files = snapshot().getOrElse(table,
      throw new IllegalArgumentException(s"no such table: $table"))
    spark.read.parquet(files.map(f => s"$root/$table/$f"): _*)
  }

  override def append(table: String, df: DataFrame): Unit =
    appendAll(Map(table -> df), batchId = None)

  /** Stage part files for every table, then make them ALL visible in one
    * atomic manifest commit that also records `batchId`. */
  private def appendAll(tables: Map[String, DataFrame],
      batchId: Option[Long]): Unit = {
    val added = tables.map { case (table, df) =>
      val staging = new File(rootDir, s".staging-${java.util.UUID.randomUUID()}")
      df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
      val dest = new File(rootDir, table)
      dest.mkdirs()
      val moved = Option(staging.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet")).map { f =>
          // part-file names carry the write UUID → no collisions; the
          // file is INVISIBLE until the manifest commit below
          if (!f.renameTo(new File(dest, f.getName)))
            throw new java.io.IOException(s"move failed: $f")
          f.getName
        }.toSeq
      rm(staging)
      table -> moved
    }.filter(_._2.nonEmpty)
    if ((added.nonEmpty || batchId.isDefined) && !recordPending(added))
      commitVersion(batchId, added)
  }

  override def appendRouted(df: DataFrame, tables: Seq[String]): Boolean = {
    val staging = new File(rootDir, s".staging-${java.util.UUID.randomUUID()}")
    df.write.partitionBy("tableName")
      .mode(SaveMode.Overwrite).parquet(staging.toString)
    val added = Option(staging.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("tableName=")).map { pdir =>
        val table = WarehouseCatalog.unescapePartitionName(
          pdir.getName.stripPrefix("tableName="))
        val dest = new File(rootDir, table)
        dest.mkdirs()
        val moved = pdir.listFiles().filter(_.getName.endsWith(".parquet"))
          .map { f =>
            if (!f.renameTo(new File(dest, f.getName)))
              throw new java.io.IOException(s"move failed: $f")
            f.getName
          }.toSeq
        table -> moved
      }.toMap
    rm(staging)
    if (added.nonEmpty && !recordPending(added)) commitVersion(None, added)
    true
  }

  override def batchCommitted(batchId: Long): Boolean =
    readLog().exists(_.batchId.contains(batchId))

  /** Publish the open batch (rows staged since [[beginBatch]]) together
    * with the batch id in ONE atomic rename — outside a batch this is
    * just the bare marker version. */
  override def commitBatch(batchId: Long): Unit = {
    val adds = synchronized {
      val a = pendingAdds.toMap
      pendingAdds.clear()
      deferring = false
      a
    }
    commitVersion(Some(batchId), adds)
  }

  /** Exactly-once batch append: all tables' rows AND the batch id become
    * visible in one atomic commit — no marker-vs-data window at all. */
  def appendBatch(batchId: Long, tables: Map[String, DataFrame]): Unit =
    appendAll(tables, Some(batchId))

  /** ONLINE compaction: write compacted files, commit a `replace`
    * version. Readers holding the old snapshot keep reading the old
    * files (still on disk until [[vacuum]]); a crash anywhere leaves
    * either the old or the new manifest — never a missing table. */
  def compact(table: String, targetFiles: Int = 1): Unit = {
    val staging = new File(rootDir, s".compact-${java.util.UUID.randomUUID()}")
    read(table).coalesce(math.max(1, targetFiles))
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val dest = new File(rootDir, table)
    val moved = Option(staging.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map { f =>
        if (!f.renameTo(new File(dest, f.getName)))
          throw new java.io.IOException(s"move failed: $f")
        f.getName
      }.toSeq
    rm(staging)
    commitVersion(None, Map.empty, replace = Map(table -> moved))
  }

  /** Remove data files no manifest version can reach (compacted-away or
    * orphaned by a crashed append). Run after a grace period longer than
    * the longest reader. */
  def vacuum(): Int = {
    val live = snapshot()
    var removed = 0
    // scan every table directory on disk, not just committed tables — a
    // crashed first-append leaves orphans under a table no manifest knows
    Option(rootDir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && !d.getName.startsWith("_") &&
        !d.getName.startsWith("."))
      .foreach { dir =>
        val liveSet = live.getOrElse(dir.getName, Nil).toSet
        Option(dir.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.endsWith(".parquet") &&
            !liveSet.contains(f.getName))
          .foreach { f => if (f.delete()) removed += 1 }
      }
    removed
  }

  def fileCount(table: String): Int = snapshot().getOrElse(table, Nil).size

  private def rm(f: File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
    f.delete(); ()
  }
}
