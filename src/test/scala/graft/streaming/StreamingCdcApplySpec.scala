package graft.streaming

import java.nio.file.Files

import graft.TestSpark
import graft.sinks.ManifestCatalog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming CDC apply: an upsert stream lands in the warehouse via
  * `foreachBatch` + copy-on-write MERGE — the standard "apply a change
  * feed to a lakehouse table" shape (Delta/Iceberg MERGE sinks).
  *
  * Pinned properties:
  *  - applying per-batch upserts through MERGE converges to the same
  *    state as one batch upsert of the latest row per key (stream ≡
  *    batch);
  *  - MERGE replay is idempotent for identical source rows — the
  *    foreachBatch retry story needs no extra marker protocol: a
  *    replayed micro-batch replaces the same keys with the same values;
  *  - every applied batch is one manifest version, so the CDC feed
  *    (`changes`) exposes each upsert as its delete+insert pair.
  */
class StreamingCdcApplySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreachBatch MERGE applies an upsert stream; replay is a no-op") {
    val root = Files.createTempDirectory("cdcapply").toString
    val cat = new ManifestCatalog(spark, root)
    cat.append("acct",
      Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("k", "balance"))

    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, Long)]
    val applied = scala.collection.mutable.ListBuffer.empty[Long]
    val q = src.toDF().toDF("k", "balance").writeStream
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        cat.merge("acct", batch, Seq("k"))
        applied.synchronized { applied += id }
        ()
      }.start()

    // batch 0: update k=2, insert k=4; batch 1: update k=4 again, k=1
    src.addData((2L, 250L), (4L, 400L))
    q.processAllAvailable()
    src.addData((4L, 450L), (1L, 150L))
    q.processAllAvailable()
    q.stop()

    val got = cat.read("acct").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 150L), (2L, 250L), (3L, 300L), (4L, 450L)),
      s"stream-of-merges must equal latest-per-key state, got $got")

    // replay of the LAST batch (the at-least-once retry case): merging
    // identical source rows again must not change the table
    val vBefore = cat.latestVersion()
    cat.merge("acct", Seq((4L, 450L), (1L, 150L)).toDF("k", "balance"),
      Seq("k"))
    val replayed = cat.read("acct").orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(replayed == got, "replayed MERGE must be a no-op on state")
    assert(cat.latestVersion() > vBefore,
      "replay commits a version (CoW) but state is unchanged")

    // CDC: the last streamed merge shows k=4's update as delete+insert
    val feed = cat.changes("acct", vBefore - 1, vBefore)
      .select(col("_op"), col("k"), col("balance")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(feed.contains(("delete", 4L, 400L)) &&
      feed.contains(("insert", 4L, 450L)),
      s"CDC must expose the update as delete+insert, got $feed")
    assert(applied.size == 2)
  }
}
