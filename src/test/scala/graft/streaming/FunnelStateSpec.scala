package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming funnel (FunnelState) against its batch twin (q90): the
  * transition rules are shared semantics, so for in-order delivery the
  * final streaming state must equal the batch query's stages. */
class FunnelStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val fmt = "yyyy-MM-dd HH:mm:ss"

  test("batch-mode fold equals q90 on the fixture events") {
    // flatMapGroupsWithState in batch mode = one empty-state fold per
    // user — the unification path: identical code, no state store
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val folded = FunnelState.track(ev)
      .toDF()
      .select(col("user_id"), col("stage"),
        date_format(col("signup_at"), fmt).as("signup_at"),
        date_format(col("click_at"), fmt).as("click_at"),
        date_format(col("purchase_at"), fmt).as("purchase_at"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getString(4))).sortBy(_._1)

    val batch = SparkEntry.queries("q90_funnel")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(4), r.getString(1),
        r.getString(2), r.getString(3))).sortBy(_._1)

    assert(folded.toSeq == batch.toSeq)
    assert(batch.nonEmpty)
  }

  test("state carries across micro-batches and emits on stage advance") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val src = MemoryStream[(Long, String, Timestamp)]
    val name = s"funnel${System.nanoTime()}"
    val q = FunnelState.track(
        src.toDF().toDF("user_id", "event_type", "ts"))
      .writeStream.format("memory").queryName(name).outputMode("update")
      .option("checkpointLocation", Files.createTempDirectory("ck").toString)
      .start()
    def ts(min: Int) = new Timestamp(1704067200000L + min * 60000L)
    try {
      src.addData((1L, "signup", ts(0)), (1L, "view", ts(1)))
      q.processAllAvailable()
      // batch 2: the click must qualify against batch 1's stored signup
      src.addData((1L, "click", ts(5)), (2L, "click", ts(5)))
      q.processAllAvailable()
      src.addData((1L, "purchase", ts(9)))
      q.processAllAvailable()
      val rows = spark.table(name)
        .select(col("user_id"), col("stage")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
      // user 1 advances 1 → 2 → 3 (one emission per advance); user 2's
      // click precedes any signup and must emit nothing
      assert(rows.sorted == Seq((1L, 1), (1L, 2), (1L, 3)))
    } finally q.stop()
  }

  test("stage machine ignores non-qualifying transitions") {
    val s0 = FunnelState.FunnelStage(None, None, None)
    val us = 1000000L
    val day = 24L * 3600 * 1000000L
    val afterSignup = FunnelState.step(s0, "signup", us)
    assert(afterSignup.stage == 1)
    // click at the same µs is NOT strictly after the signup
    assert(FunnelState.step(afterSignup, "click", us) == afterSignup)
    // click beyond the 7-day window
    assert(FunnelState.step(afterSignup, "click", us + 8 * day) == afterSignup)
    // purchase before any click
    assert(FunnelState.step(afterSignup, "purchase", us + 1) == afterSignup)
    val clicked = FunnelState.step(afterSignup, "click", us + 1)
    assert(clicked.stage == 2)
    val bought = FunnelState.step(clicked, "purchase", us + 2)
    assert(bought.stage == 3)
    // earlier signup re-anchors (at-arrival semantics keep later stages)
    assert(FunnelState.step(bought, "signup", us - 1).signupUs
      .contains(us - 1))
  }
}
