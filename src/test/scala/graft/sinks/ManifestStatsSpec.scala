package graft.sinks

import java.nio.file.Files

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-file column stats in the manifest log + data-skipping reads:
  * pruning must drop provably-disjoint files, NEVER change results, keep
  * stats-free files conservatively, follow files through compaction, and
  * survive the checkpoint fold. */
class ManifestStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 1000 rows range-partitioned on k into ~8 files → each file covers a
    * narrow k range, the layout data skipping exists for. */
  private def layoutFrame() =
    spark.range(1000).toDF("k")
      .withColumn("v", col("k") * 7 % 100)
      .repartitionByRange(8, col("k"))

  test("pruned range read skips disjoint files and matches the full read") {
    val root = Files.createTempDirectory("mstats").toString
    val cat = new ManifestCatalog(spark, root)
    cat.appendWithStats("t", layoutFrame(), Seq("k"))

    val (kept, all) = cat.statsPrunedFiles("t", "k",
      BigDecimal(100), BigDecimal(220))
    assert(all.size >= 6, s"layout should write several files, got $all")
    assert(kept.size < all.size,
      s"a narrow range must skip files: kept ${kept.size} of ${all.size}")
    assert(kept.nonEmpty)

    val viaSkip = cat.readBetween("t", "k", 100, 220)
      .agg(count(lit(1)), sum(col("v"))).head()
    val viaFull = cat.read("t")
      .filter(col("k") >= 100 && col("k") <= 220)
      .agg(count(lit(1)), sum(col("v"))).head()
    assert(viaSkip == viaFull, "skipping must never change results")
    assert(viaSkip.getLong(0) == 121)
  }

  test("string stats values with tabs/newlines cannot corrupt the block") {
    val root = Files.createTempDirectory("mstats").toString
    val cat = new ManifestCatalog(spark, root)
    // min/max land on values embedding \t, \n, \\ and a FORGED stats
    // line for column k claiming range [9000, 9999] — if field escaping
    // leaked, decode would either throw or wrongly skip every k file
    val hostile = Seq(
      (1L, "aaa\tmid\tzz"),
      (2L, "zz\nk\t9000\t9999"),
      (3L, "mm\\weird")).toDF("k", "s").repartition(1)
    cat.appendWithStats("t", hostile, Seq("k", "s"))

    // decode round-trips every hostile byte, under the right column
    val stats = cat.fileStats("t")
    assert(stats.nonEmpty)
    val byCol = stats.values.head
    assert(byCol("s") == (("aaa\tmid\tzz", "zz\nk\t9000\t9999")))
    assert(byCol("k") == (("1", "3")))

    // and k's REAL range [1,3] governs pruning: a probe at the forged
    // range must skip the file, a probe at the true range must keep it
    val (keptForged, all) = cat.statsPrunedFiles("t", "k",
      BigDecimal(9000), BigDecimal(9999))
    assert(keptForged.isEmpty && all.size == 1)
    val (keptTrue, _) = cat.statsPrunedFiles("t", "k",
      BigDecimal(2), BigDecimal(2))
    assert(keptTrue.size == 1)
    assert(cat.readBetween("t", "k", 1, 3).count() == 3)
  }

  test("legacy (pre-escape) stats blocks decode their fields verbatim") {
    val root = Files.createTempDirectory("mstats").toString
    val cat = new ManifestCatalog(spark, root)
    // a block written BEFORE field escaping existed: no header line,
    // fields raw. A value holding a literal backslash-t SEQUENCE (two
    // characters: '\' 't' — e.g. a Windows path "C:\temp") must decode
    // to those two characters, not be reinterpreted as a tab: that
    // would alter the recorded extremum and could prune files that DO
    // contain matches.
    val legacyLine = "p\tC:\\temp\\a\tC:\\temp\\z"
    val legacy = java.util.Base64.getEncoder
      .encodeToString(legacyLine.getBytes("UTF-8"))
    assert(cat.decodeColStats(legacy) ==
      Map("p" -> (("C:\\temp\\a", "C:\\temp\\z"))))
    // the modern encoder versions its block with a header and
    // round-trips the same hostile value exactly
    val modern = cat.encodeColStats(
      Map("p" -> (("C:\\temp\\a", "with\ttab\nand\\more"))))
    assert(new String(java.util.Base64.getDecoder.decode(modern), "UTF-8")
      .startsWith("#esc1\n"))
    assert(cat.decodeColStats(modern) ==
      Map("p" -> (("C:\\temp\\a", "with\ttab\nand\\more"))))
  }

  test("files without stats are always kept (conservative pruning)") {
    val root = Files.createTempDirectory("mstats").toString
    val cat = new ManifestCatalog(spark, root)
    cat.appendWithStats("t", layoutFrame(), Seq("k"))
    // a streaming-style append with NO stats, out of the probed range
    cat.append("t", Seq((5000L, 1L)).toDF("k", "v").repartition(1))

    val (kept, all) = cat.statsPrunedFiles("t", "k",
      BigDecimal(100), BigDecimal(220))
    assert(kept.size < all.size)
    // the stats-free file cannot be proven disjoint — it must be kept
    val (keptFar, _) = cat.statsPrunedFiles("t", "k",
      BigDecimal(100000), BigDecimal(200000))
    assert(keptFar.size == 1, "only the stats-free file survives pruning")
    assert(cat.readBetween("t", "k", 4000, 6000).count() == 1)
  }

  test("empty pruned set still returns correct (empty) results") {
    val root = Files.createTempDirectory("mstats").toString
    val cat = new ManifestCatalog(spark, root)
    cat.appendWithStats("t", layoutFrame(), Seq("k"))
    val (kept, _) = cat.statsPrunedFiles("t", "k",
      BigDecimal(100000), BigDecimal(200000))
    assert(kept.isEmpty)
    assert(cat.readBetween("t", "k", 100000, 200000).count() == 0)
  }

  test("compaction drops consumed files' stats; compacted file is kept") {
    val root = Files.createTempDirectory("mstats").toString
    val cat = new ManifestCatalog(spark, root)
    cat.appendWithStats("t", layoutFrame(), Seq("k"))
    cat.compact("t", targetFiles = 1)
    val (kept, all) = cat.statsPrunedFiles("t", "k",
      BigDecimal(100), BigDecimal(220))
    // no stats on the compacted file → nothing can be pruned, but reads
    // stay correct and no stale stats refer to consumed files
    assert(all.size == 1 && kept.size == 1)
    assert(cat.readBetween("t", "k", 100, 220).count() == 121)
    // a fresh stats-bearing re-layout restores skipping
    val snap = cat.read("t")
    cat.delete("t", col("k") >= 0) // clear via CoW delete
    assert(cat.read("t").count() == 0)
    cat.appendWithStats("t", snap.repartitionByRange(8, col("k")), Seq("k"))
    val (kept2, all2) = cat.statsPrunedFiles("t", "k",
      BigDecimal(100), BigDecimal(220))
    assert(kept2.size < all2.size)
  }

  test("z-order box query prunes on BOTH dims") {
    val root = Files.createTempDirectory("mstats").toString
    val cat = new ManifestCatalog(spark, root)
    val grid = spark.range(4096).toDF("i")
      .select((col("i") % 64).as("x"), (col("i") / 64).cast("long").as("y"))
    cat.appendWithStats("g",
      graft.operators.ZOrderLayout.layout(grid, "x", "y", 16),
      Seq("x", "y"))
    val viaBox = cat.readPruned("g", Seq(("x", 10L, 20L), ("y", 10L, 20L)))
    assert(viaBox.count() == 121)
    // each conjunct must prune beyond the other alone: the kept set of
    // the box is strictly inside both single-dim kept sets
    val (keptX, all) = cat.statsPrunedFiles("g", "x",
      BigDecimal(10), BigDecimal(20))
    val (keptY, _) = cat.statsPrunedFiles("g", "y",
      BigDecimal(10), BigDecimal(20))
    assert(keptX.size < all.size && keptY.size < all.size,
      s"z-order must keep BOTH dims' zone maps tight " +
        s"(x ${keptX.size}, y ${keptY.size} of ${all.size})")
    assert(keptX.toSet.intersect(keptY.toSet).size < keptX.size.max(keptY.size))
  }

  test("stats survive the checkpoint fold and vacuum") {
    val root = Files.createTempDirectory("mstats").toString
    val cat = new ManifestCatalog(spark, root, checkpointInterval = 3)
    cat.appendWithStats("t", layoutFrame(), Seq("k"))
    // push past a checkpoint boundary with unrelated commits
    (0 until 4).foreach { i =>
      cat.append("other", Seq((i.toLong, i.toLong)).toDF("k", "v"))
    }
    assert(cat.vacuum(retentionMs = 0L) >= 0) // reclaim folded deltas
    val cat2 = new ManifestCatalog(spark, root) // fresh reader, fresh fold
    val (kept, all) = cat2.statsPrunedFiles("t", "k",
      BigDecimal(100), BigDecimal(220))
    assert(kept.size < all.size,
      "stats must survive checkpoint materialization + vacuum")
    assert(cat2.readBetween("t", "k", 100, 220).count() == 121)
  }
}
