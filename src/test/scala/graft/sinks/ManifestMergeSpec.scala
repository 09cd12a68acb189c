package graft.sinks

import java.nio.file.Files

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Row-level ops on the manifest format: copy-on-write MERGE/DELETE and
  * the version-to-version CDC change feed. The load-bearing properties:
  * only files containing matched rows are rewritten, every op is ONE
  * atomic manifest version, the pre-op snapshot stays time-travelable,
  * and the change feed reads only the files two versions disagree on. */
class ManifestMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCatalog() = {
    val root = Files.createTempDirectory("manifest-merge").toString
    new ManifestCatalog(spark, root)
  }

  private def rows(cat: ManifestCatalog, table: String): Set[(Long, String)] =
    cat.read(table).as[(Long, String)].collect().toSet

  test("merge upserts: matched keys replaced, unseen keys inserted") {
    val cat = freshCatalog()
    cat.append("t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    cat.merge("t", Seq((2L, "B"), (9L, "i")).toDF("k", "v"), Seq("k"))
    assert(rows(cat, "t") == Set((1L, "a"), (2L, "B"), (3L, "c"), (9L, "i")))
  }

  test("copy-on-write minimality: untouched files survive by name") {
    val cat = freshCatalog()
    cat.append("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    cat.append("t", Seq((10L, "x"), (11L, "y")).toDF("k", "v"))
    val Seq(f1, f2) = Seq(1L, 10L).map { probe =>
      cat.read("t").filter($"k" === probe).select($"_metadata.file_name")
        .as[String].head()
    }
    cat.merge("t", Seq((10L, "X")).toDF("k", "v"), Seq("k")) // hits f2 only
    val live = cat.read("t").inputFiles.map(_.split('/').last).toSet
    assert(live.contains(f1), "file without matches must not be rewritten")
    assert(!live.contains(f2), "file with a match must be replaced")
    assert(rows(cat, "t") ==
      Set((1L, "a"), (2L, "b"), (10L, "X"), (11L, "y")))
  }

  test("pure-insert merge touches no existing file") {
    val cat = freshCatalog()
    cat.append("t", Seq((1L, "a")).toDF("k", "v"))
    val before = cat.read("t").inputFiles.map(_.split('/').last).toSet
    val v0 = cat.latestVersion()
    cat.merge("t", Seq((2L, "b")).toDF("k", "v"), Seq("k"))
    val after = cat.read("t").inputFiles.map(_.split('/').last).toSet
    assert(before.subsetOf(after))
    assert(cat.latestVersion() == v0 + 1) // one atomic version per merge
    assert(rows(cat, "t") == Set((1L, "a"), (2L, "b")))
  }

  test("merge keeps the pre-merge version time-travelable until vacuum") {
    val cat = freshCatalog()
    cat.append("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val pre = cat.latestVersion()
    cat.merge("t", Seq((2L, "B")).toDF("k", "v"), Seq("k"))
    assert(cat.readAt("t", pre).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
    assert(rows(cat, "t") == Set((1L, "a"), (2L, "B")))
  }

  test("delete removes matching rows; NULL predicate rows are kept") {
    val cat = freshCatalog()
    cat.append("t", Seq((1L, Some("a")), (2L, Some("drop")),
      (3L, None: Option[String])).toDF("k", "v"))
    cat.append("t", Seq((4L, Some("keep"))).toDF("k", "v"))
    val untouched = cat.read("t").filter($"k" === 4L)
      .select($"_metadata.file_name").as[String].head()
    cat.delete("t", $"v" === "drop") // NULL for k=3 → kept (SQL semantics)
    assert(cat.read("t").as[(Long, Option[String])].collect().toSet ==
      Set((1L, Some("a")), (3L, None), (4L, Some("keep"))))
    assert(cat.read("t").inputFiles.map(_.split('/').last).toSet
      .contains(untouched), "file without matches must not be rewritten")
  }

  test("delete matching nothing commits nothing") {
    val cat = freshCatalog()
    cat.append("t", Seq((1L, "a")).toDF("k", "v"))
    val v0 = cat.latestVersion()
    cat.delete("t", $"v" === "absent")
    assert(cat.latestVersion() == v0)
  }

  test("changes(): update = delete+insert pair; unchanged rows cancel") {
    val cat = freshCatalog()
    cat.append("t", Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    val pre = cat.latestVersion()
    // update k=2, insert k=9 — k=1/k=3 are rewritten (same file) but
    // byte-identical, so they must NOT appear in the feed
    cat.merge("t", Seq((2L, "B"), (9L, "i")).toDF("k", "v"), Seq("k"))
    val feed = cat.changes("t", pre, cat.latestVersion())
      .as[(String, Long, String)].collect().toSet
    assert(feed == Set(
      ("delete", 2L, "b"), ("insert", 2L, "B"), ("insert", 9L, "i")))
  }

  test("changes() across a no-op range is empty") {
    val cat = freshCatalog()
    cat.append("t", Seq((1L, "a")).toDF("k", "v"))
    val v = cat.latestVersion()
    assert(cat.changes("t", v, v).count() == 0)
  }

  test("vacuum reclaims merged-away files; live + feed data unaffected") {
    val cat = freshCatalog()
    cat.append("t", Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    cat.merge("t", Seq((2L, "B")).toDF("k", "v"), Seq("k"))
    assert(cat.vacuum(retentionMs = 0L) >= 1) // the consumed pre-merge file
    assert(rows(cat, "t") == Set((1L, "a"), (2L, "B")))
  }
}
