package graft.sinks

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ManifestTimeTravelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("readAt pins each committed version's content") {
    val cat = new ManifestCatalog(spark,
      Files.createTempDirectory("tt").toString)
    cat.append("t", Seq(("a", 1.0)).toDF("client", "value"))   // v0
    cat.append("t", Seq(("b", 2.0)).toDF("client", "value"))   // v1
    cat.append("t", Seq(("c", 3.0)).toDF("client", "value"))   // v2
    assert(cat.latestVersion() == 2)
    assert(cat.readAt("t", 0).collect().map(_.getString(0)).toSet == Set("a"))
    assert(cat.readAt("t", 1).collect().map(_.getString(0)).toSet ==
      Set("a", "b"))
    assert(cat.readAt("t", 2).collect().map(_.getString(0)).toSet ==
      Set("a", "b", "c"))
    intercept[IllegalArgumentException](cat.readAt("t", 3))
    intercept[IllegalArgumentException](cat.readAt("missing", 2))
  }

  test("old snapshots survive compaction until vacuum reclaims them") {
    val cat = new ManifestCatalog(spark,
      Files.createTempDirectory("tt").toString)
    cat.append("t", Seq(("a", 1.0)).toDF("client", "value"))   // v0
    cat.append("t", Seq(("b", 2.0)).toDF("client", "value"))   // v1
    cat.compact("t")                                           // v2
    assert(cat.fileCount("t") == 1)
    // pre-compaction version still reads the ORIGINAL files
    assert(cat.readAt("t", 1).collect().map(_.getString(0)).toSet ==
      Set("a", "b"))
    assert(cat.vacuum(retentionMs = 0L) > 0) // reclaims the compacted-away data files
    assert(cat.read("t").count() == 2) // live snapshot unaffected
    // the travel window shrank: v1's data files are gone
    intercept[Exception] {
      cat.readAt("t", 1).collect()
    }
  }

  test("travel works from a checkpoint base and fails loudly below it") {
    val cat = new ManifestCatalog(spark,
      Files.createTempDirectory("tt").toString, checkpointInterval = 2)
    (0 until 4).foreach { i =>
      cat.append("t", Seq((s"r$i", i.toDouble)).toDF("client", "value"))
    }
    assert(cat.vacuum(retentionMs = 0L) > 0) // deltas folded into the latest checkpoint go
    // the latest checkpoint (v3) and the live head still read fine
    assert(cat.read("t").count() == 4)
    assert(cat.readAt("t", 3).count() == 4)
    // below the checkpoint the delta chain is gone — loud failure, not a
    // silently incomplete fold
    intercept[IllegalStateException](cat.snapshotAt(0))
  }
}
