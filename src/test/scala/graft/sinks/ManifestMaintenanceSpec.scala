package graft.sinks

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The small-files maintenance job: high-file-count tables compact, low
  * ones don't, unreachable files and folded log versions reclaim, and
  * the stream's view of the data never changes. */
class ManifestMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("compacts only tables over the threshold; data identical after") {
    val root = Files.createTempDirectory("maint").toString
    val cat = new ManifestCatalog(spark, root, checkpointInterval = 8)
    // "hot" accumulates 20 single-row files; "cold" only 3
    (1 to 20).foreach { i =>
      cat.append("hot", Seq((s"c$i", i.toDouble)).toDF("client", "value"))
    }
    (1 to 3).foreach { i =>
      cat.append("cold", Seq((s"c$i", i.toDouble)).toDF("client", "value"))
    }
    assert(cat.fileCount("hot") == 20 && cat.fileCount("cold") == 3)

    val report = ManifestMaintenance.run(cat, maxFilesPerTable = 16,
      targetFiles = 2, vacuumRetentionMs = 0L)
    assert(report.compacted == Seq("hot"))
    assert(report.reclaimedFiles >= 20) // 20 pre-compaction data files+
    assert(cat.fileCount("hot") <= 2)
    assert(cat.fileCount("cold") == 3)
    assert(cat.read("hot").count() == 20)
    assert(cat.read("hot").agg(org.apache.spark.sql.functions
      .sum("value")).head.getDouble(0) == 210.0)
    assert(cat.read("cold").count() == 3)

    // idempotent: a second run has nothing to do
    val again = ManifestMaintenance.run(cat, maxFilesPerTable = 16,
      targetFiles = 2, vacuumRetentionMs = 0L)
    assert(again.compacted.isEmpty)
    // appends keep working after maintenance
    cat.append("hot", Seq(("c21", 21.0)).toDF("client", "value"))
    assert(cat.read("hot").count() == 21)
  }
}
