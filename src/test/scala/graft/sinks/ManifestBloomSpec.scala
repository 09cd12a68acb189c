package graft.sinks

import java.nio.file.Files

import graft.TestSpark
import graft.functions.FileBloomAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-file bloom skipping: point lookups must prune files the bloom
  * proves empty, NEVER lose rows (no false negatives), keep bloom-free
  * files conservatively, and coexist with min/max range stats in the
  * same commit. */
class ManifestBloomSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Three appends with disjoint key ranges → ≥3 file groups whose
    * blooms answer point lookups. High-cardinality scattered ids are
    * exactly where min/max zone maps stop helping. */
  private def catalog(): ManifestCatalog = {
    val root = Files.createTempDirectory("mbloom").toString
    val cat = new ManifestCatalog(spark, root)
    Seq(0L, 1L, 2L).foreach { b =>
      val df = spark.range(b * 1000, b * 1000 + 500).toDF("k")
        .withColumn("v", col("k") * 3)
        .repartition(1)
      cat.appendWithStats("t", df, statsCols = Seq("k"),
        bloomCols = Seq("k"))
    }
    cat
  }

  test("point lookup reads only the file that can hold the key") {
    val cat = catalog()
    val (kept, all) = cat.bloomPrunedFiles("t", "k", "1042")
    assert(all.size >= 3)
    assert(kept.size < all.size,
      s"bloom must prune: kept ${kept.size} of ${all.size}")
    val got = cat.readPoint("t", "k", "1042").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1042L, 3126L)))
  }

  test("no false negatives across every key in the table") {
    val cat = catalog()
    val keys = Seq(0L, 499L, 1000L, 1499L, 2000L, 2499L)
    keys.foreach { k =>
      assert(cat.readPoint("t", "k", k.toString).count() == 1L,
        s"key $k must survive bloom pruning")
    }
  }

  test("absent key prunes everything; bloom-free appends stay kept") {
    val cat = catalog()
    val (keptAbsent, _) = cat.bloomPrunedFiles("t", "k", "999999")
    // ~2-3% fpp per file: with 3 files an occasional survivor is fine,
    // but this fixed probe misses all three (deterministic hashes)
    assert(keptAbsent.isEmpty)
    assert(cat.readPoint("t", "k", "999999").count() == 0L)

    // a plain append writes no bloom → its file must always be kept
    cat.append("t", Seq((999999L, 1L)).toDF("k", "v").repartition(1))
    val (keptNow, _) = cat.bloomPrunedFiles("t", "k", "999999")
    assert(keptNow.size == 1)
    assert(cat.readPoint("t", "k", "999999").count() == 1L)
  }

  test("non-canonical probes are canonicalized — no false-negative pruning") {
    val cat = catalog()
    // "042" vs a LONG column: the read filter coerces the literal to
    // 42L and matches, but the bloom was built over the canonical "42".
    // The probe must round-trip through the column type or the pruning
    // silently drops the matching file.
    assert(cat.readPoint("t", "k", "042").count() == 1L)
    assert(cat.readPoint("t", "k", " 1042 ").count() == 1L) // cast trims
    val (kept, all) = cat.bloomPrunedFiles("t", "k", "042")
    assert(kept.nonEmpty && kept.size < all.size,
      "canonicalized probe must still prune to the candidate file")
    // an uncastable probe proves nothing: every file kept, filter owns
    // the semantics (no rows under non-ANSI, cast error under ANSI)
    val (keptBad, allBad) = cat.bloomPrunedFiles("t", "k", "not-a-number")
    assert(keptBad == allBad)
  }

  test("double column: probe in integer spelling still finds 1.0") {
    val root = Files.createTempDirectory("mbloomd").toString
    val cat = new ManifestCatalog(spark, root)
    Seq(Seq((1.0, "a"), (2.5, "b")), Seq((7.0, "c"), (9.5, "d")))
      .foreach { part =>
        cat.appendWithStats("d", part.toDF("x", "tag").repartition(1),
          statsCols = Nil, bloomCols = Seq("x"))
      }
    // blooms store "1.0"/"7.0" (cast-to-string of the double); the
    // probe "1" must canonicalize to "1.0" to hit the right file
    assert(cat.readPoint("d", "x", "1").count() == 1L)
    assert(cat.readPoint("d", "x", "7").count() == 1L)
    val (kept, all) = cat.bloomPrunedFiles("d", "x", "1")
    assert(all.size == 2 && kept.size == 1)
  }

  test("blooms coexist with range stats in one commit") {
    val cat = catalog()
    // range pruning still works off the same stats blocks
    val (kept, all) = cat.statsPrunedFiles("t", "k",
      BigDecimal(1100), BigDecimal(1200))
    assert(kept.size == 1 && all.size >= 3)
    // and the packed filter round-trips the driver-side probe contract
    val stats = cat.fileStats("t")
    val withBloom = stats.values.flatMap(_.get("#bloom:k")).toSeq
    assert(withBloom.size == all.size)
    val first = java.util.Base64.getDecoder.decode(withBloom.head._1)
    assert(first.length == FileBloomAgg.Words * 8)
  }
}
