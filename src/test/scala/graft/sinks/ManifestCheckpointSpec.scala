package graft.sinks

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Periodic manifest checkpointing: the log fold must read O(interval)
  * files regardless of stream lifetime, vacuum must reclaim the folded
  * delta versions, and a deleted checkpoint must degrade gracefully to
  * the full-delta fold (a checkpoint is derived data, never the truth). */
class ManifestCheckpointSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mk(interval: Int = 4) = {
    val root = Files.createTempDirectory("manifest-ckpt").toString
    (new ManifestCatalog(spark, root, checkpointInterval = interval), root)
  }

  test("fold reads O(interval) files after checkpoint, not O(lifetime)") {
    val (cat, _) = mk(interval = 4)
    (0 until 11).foreach { b =>
      cat.appendBatch(b, Map("t" -> Seq((s"c$b", b.toDouble))
        .toDF("client", "value")))
    }
    // versions 0..10; checkpoints at v3 and v7 → fold = 1 ckpt + 3 deltas
    val (ckpt, deltas) = cat.logStats()
    assert(ckpt.contains(7L), s"latest checkpoint: $ckpt")
    assert(deltas == 3, s"deltas after checkpoint: $deltas")
    assert(cat.read("t").count() == 11)
    (0 until 11).foreach(b => assert(cat.batchCommitted(b)))
    assert(!cat.batchCommitted(99))
  }

  test("vacuum reclaims pre-checkpoint deltas; reads stay correct") {
    val (cat, root) = mk(interval = 4)
    (0 until 10).foreach { b =>
      cat.appendBatch(b, Map("t" -> Seq((s"c$b", b.toDouble))
        .toDF("client", "value")))
    }
    val manifest = new java.io.File(s"$root/_manifest")
    def logFiles(prefix: String) =
      manifest.listFiles().count(f => f.getName.startsWith(prefix) &&
        f.getName.endsWith(".json"))
    assert(logFiles("v") == 10 && logFiles("c") == 2)
    val removed = cat.vacuum(retentionMs = 0L)
    // deltas v0..v7 folded into c7 + the superseded c3 are reclaimed
    assert(removed == 9, s"removed=$removed")
    assert(logFiles("v") == 2 && logFiles("c") == 1)
    assert(cat.read("t").count() == 10)
    assert(cat.listTables() == Seq("t"))
    // post-vacuum commits keep advancing the version sequence
    cat.appendBatch(10, Map("t" -> Seq(("c10", 10.0))
      .toDF("client", "value")))
    assert(cat.read("t").count() == 11 && cat.batchCommitted(10))
  }

  test("batch-id retention survives checkpointing and vacuum") {
    val (cat, _) = mk(interval = 3)
    (0 until 9).foreach { b =>
      cat.appendBatch(b, Map("t" -> Seq((s"c$b", b.toDouble))
        .toDF("client", "value")))
    }
    cat.vacuum(retentionMs = 0L)
    (0 until 9).foreach(b =>
      assert(cat.batchCommitted(b), s"batch $b lost by checkpoint/vacuum"))
  }

  test("deleted checkpoint degrades to the full delta fold") {
    val (cat, root) = mk(interval = 4)
    (0 until 6).foreach { b =>
      cat.appendBatch(b, Map("t" -> Seq((s"c$b", b.toDouble))
        .toDF("client", "value")))
    }
    new java.io.File(s"$root/_manifest").listFiles()
      .filter(_.getName.startsWith("c")).foreach(f => assert(f.delete()))
    val (ckpt, deltas) = cat.logStats()
    assert(ckpt.isEmpty && deltas == 6)
    assert(cat.read("t").count() == 6)
    (0 until 6).foreach(b => assert(cat.batchCommitted(b)))
  }

  test("a catalog reopened on an existing log resumes the version sequence") {
    val (cat, root) = mk(interval = 4)
    (0 until 6).foreach { b =>
      cat.appendBatch(b, Map("t" -> Seq((s"c$b", b.toDouble))
        .toDF("client", "value")))
    }
    cat.vacuum(retentionMs = 0L)
    // a NEW instance (post-restart driver) must continue after v5, not
    // restart at 0 — its first read seeds from checkpoint + deltas
    val cat2 = new ManifestCatalog(spark, root, checkpointInterval = 4)
    cat2.appendBatch(6, Map("t" -> Seq(("c6", 6.0))
      .toDF("client", "value")))
    assert(cat2.read("t").count() == 7)
    (0 to 6).foreach(b => assert(cat2.batchCommitted(b)))
    assert(cat.read("t").count() == 7) // old handle sees the new commit too
  }

  test("append committed during a compaction window survives the fold") {
    // the race compaction must tolerate: it snapshots [f1, f2], rewrites
    // them, and while the rewrite runs a batch commits f3; the
    // compaction version removes EXACTLY {f1, f2}, so f3 stays live
    val (cat, _) = mk()
    cat.commitVersion(None, Map("t" -> Seq("f1.parquet")))
    cat.commitVersion(None, Map("t" -> Seq("f2.parquet")))
    // compaction committed AFTER a concurrent add, removing only what it
    // consumed
    cat.commitVersion(None, Map("t" -> Seq("f3.parquet"))) // concurrent add
    cat.commitVersion(None, add = Map("t" -> Seq("c1.parquet")),
      removed = Map("t" -> Seq("f1.parquet", "f2.parquet")))
    assert(cat.fileCount("t") == 2) // c1 + the concurrently-added f3
  }

  test("concurrent appends during live compactions lose no rows") {
    val (cat, _) = mk(interval = 8)
    val writer = new Thread(() => {
      (1 to 30).foreach { i =>
        cat.appendBatch(i.toLong,
          Map("t" -> Seq((s"c$i", i.toDouble)).toDF("client", "value")))
      }
    })
    writer.start()
    // maintenance loop racing the stream: compact whenever files pile up
    while (writer.isAlive) {
      if (cat.listTables().contains("t") && cat.fileCount("t") > 4)
        cat.compact("t", targetFiles = 2)
      else Thread.sleep(10)
    }
    writer.join()
    cat.compact("t", targetFiles = 1)
    assert(cat.read("t").count() == 30,
      "every concurrently-appended row must survive compaction")
    assert(cat.read("t").agg(org.apache.spark.sql.functions.sum("value"))
      .head.getDouble(0) == 465.0) // 1+2+...+30
    (1 to 30).foreach(b => assert(cat.batchCommitted(b)))
  }

  test("soak: commit cost stays bounded by the checkpoint interval") {
    val (cat, _) = mk(interval = 10)
    // a manifest-only soak (no parquet writes — commitVersion is the
    // per-batch driver cost under test)
    (0 until 2000).foreach { i =>
      cat.commitVersion(Some(i.toLong), Map("t" -> Seq(s"f$i.parquet")))
      if (i % 500 == 0) cat.vacuum(retentionMs = 0L)
    }
    val (ckpt, deltas) = cat.logStats()
    assert(ckpt.exists(_ >= 1989L), s"ckpt=$ckpt")
    assert(deltas < 10, s"deltas=$deltas")
    assert(cat.fileCount("t") == 2000)
    assert(cat.batchCommitted(1999))
  }
}
