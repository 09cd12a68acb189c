package graft.sinks

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Log-tracked schema + ADD-COLUMN evolution: the schema travels in the
  * manifest commit (not in parquet footers), old files are never
  * rewritten when a column is added (they surface NULLs), appends
  * missing columns are NULL-filled, type conflicts fail loudly, and
  * time travel reads each version under the schema recorded THEN. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog(interval: Int = 20) = new ManifestCatalog(spark,
    Files.createTempDirectory("manifest-evo").toString, interval)

  test("add-column append evolves the schema; old files surface NULLs") {
    val cat = freshCatalog()
    cat.append("t", Seq((1L, "a")).toDF("k", "v"))
    val oldFiles = cat.read("t").inputFiles.toSet
    cat.append("t", Seq((2L, "b", 9L)).toDF("k", "v", "extra"))
    val out = cat.read("t").as[(Long, String, Option[Long])]
      .collect().toSet
    assert(out == Set((1L, "a", None), (2L, "b", Some(9L))))
    assert(oldFiles.subsetOf(cat.read("t").inputFiles.toSet),
      "evolution must not rewrite existing files")
  }

  test("append missing an existing column NULL-fills it") {
    val cat = freshCatalog()
    cat.append("t", Seq((1L, "a")).toDF("k", "v"))
    cat.append("t", Seq(Tuple1(2L)).toDF("k"))
    assert(cat.read("t").as[(Long, Option[String])].collect().toSet ==
      Set((1L, Some("a")), (2L, None)))
  }

  test("type conflict on a shared column fails loudly") {
    val cat = freshCatalog()
    cat.append("t", Seq((1L, "a")).toDF("k", "v"))
    val e = intercept[IllegalArgumentException] {
      cat.append("t", Seq((2L, 3.14)).toDF("k", "v"))
    }
    assert(e.getMessage.contains("'v'"))
  }

  test("time travel reads the schema recorded AT that version") {
    val cat = freshCatalog()
    cat.append("t", Seq((1L, "a")).toDF("k", "v"))
    val pre = cat.latestVersion()
    cat.append("t", Seq((2L, "b", 9L)).toDF("k", "v", "extra"))
    assert(cat.readAt("t", pre).columns.toSeq == Seq("k", "v"),
      "a later add-column must not leak into the past")
    assert(cat.read("t").columns.toSeq == Seq("k", "v", "extra"))
  }

  test("schema survives the checkpoint fold") {
    val cat = freshCatalog(interval = 2)
    cat.append("t", Seq((1L, "a")).toDF("k", "v"))
    cat.append("t", Seq((2L, "b", 9L)).toDF("k", "v", "extra"))
    (1 to 4).foreach(i =>
      cat.append("t", Seq((10L + i, s"c$i", i.toLong))
        .toDF("k", "v", "extra")))
    assert(cat.vacuum(retentionMs = 0L) >= 1) // deltas before the checkpoint are folded in
    assert(cat.read("t").columns.toSeq == Seq("k", "v", "extra"))
    assert(cat.read("t").filter($"extra".isNull).count() == 1)
  }

  test("merge after evolution keeps the evolved schema") {
    val cat = freshCatalog()
    cat.append("t", Seq((1L, "a")).toDF("k", "v"))
    cat.append("t", Seq((2L, "b", 9L)).toDF("k", "v", "extra"))
    cat.merge("t", Seq((1L, "A", 7L)).toDF("k", "v", "extra"), Seq("k"))
    assert(cat.read("t").as[(Long, String, Option[Long])].collect().toSet ==
      Set((1L, "A", Some(7L)), (2L, "b", Some(9L))))
  }

  test("batch append records the evolved schema in the SAME commit") {
    val cat = freshCatalog()
    cat.appendBatch(1, Map("t" -> Seq((1L, "a")).toDF("k", "v")))
    val v0 = cat.latestVersion()
    cat.appendBatch(2,
      Map("t" -> Seq((2L, "b", 9L)).toDF("k", "v", "extra")))
    assert(cat.latestVersion() == v0 + 1) // rows + schema: one version
    assert(cat.read("t").columns.toSeq == Seq("k", "v", "extra"))
    assert(cat.batchCommitted(2))
  }
}
