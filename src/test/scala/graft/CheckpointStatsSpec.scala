package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the mechanism every superstep loop's convergence probe now
  * rides on: [[Tuning.checkpointWithStats]] folds aggregate metrics
  * into the SAME job that materializes an eager localCheckpoint
  * (Dataset.observe / CollectMetricsExec), so a driver-coordinated
  * round is one job instead of checkpoint + stat probe. The spec pins
  * (a) that the synchronous QueryExecution.observedMetrics read
  * resolves off the checkpoint action (a Spark version that stopped
  * populating observed metrics on checkpoint would throw
  * checkpointWithStats' IllegalStateException here — fail-fast, not a
  * silent regression),
  * (b) bit-equality of the observed stats with a separate agg job,
  * (c) the null/empty-frame conventions the callers rely on, and
  * (d) that the returned frame is pinned (re-readable after the
  * upstream is gone) and releasable via Resources.releaseCheckpoint. */
class CheckpointStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("observed stats equal a separate aggregation job bit-for-bit") {
    import spark.implicits._
    val df = Seq((1L, 10L), (2L, 7L), (3L, -4L), (4L, 10L))
      .toDF("id", "v")
    val (pinned, st) = Tuning.checkpointWithStats(df,
      count(lit(1)).cast("long").as("n"),
      max(col("v")).cast("long").as("mx"),
      sum(col("v")).cast("long").as("s"))
    assert(st("n") === 4L)
    assert(st("mx") === 10L)
    assert(st("s") === 23L)
    val r = pinned.agg(count(lit(1)), max(col("v")), sum(col("v"))).head()
    assert(r.getLong(0) === st("n"))
    assert(r.getLong(1) === st("mx"))
    assert(r.getLong(2) === st("s"))
    Resources.releaseCheckpoint(pinned)
  }

  test("empty frame: count observes 0, max/sum observe null") {
    import spark.implicits._
    val df = Seq.empty[(Long, Long)].toDF("id", "v")
    val (pinned, st) = Tuning.checkpointWithStats(df,
      count(lit(1)).cast("long").as("n"),
      max(col("v")).cast("long").as("mx"))
    assert(st("n") === 0L)
    assert(st("mx") === null)
    assert(pinned.count() === 0L)
    Resources.releaseCheckpoint(pinned)
  }

  test("returned frame is pinned: lineage is truncated and re-reads " +
      "do not re-fire the metrics pass") {
    import spark.implicits._
    val df = Seq((1L, 2L), (3L, 4L)).toDF("u", "v")
    val (pinned, st) = Tuning.checkpointWithStats(df,
      count(lit(1)).cast("long").as("n"))
    assert(st("n") === 2L)
    // lineage truncated: the plan is a LogicalRDD leaf, no
    // CollectMetrics node survives into downstream reads
    val analyzed = pinned.queryExecution.analyzed
    assert(analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l
    }.nonEmpty, "checkpointed frame should scan a LogicalRDD")
    assert(!analyzed.toString.contains("CollectMetrics"),
      "observe node must not survive the checkpoint boundary")
    // stays re-readable (multiple actions over the pinned blocks)
    assert(pinned.count() === 2L)
    assert(pinned.agg(sum(col("u"))).head().getLong(0) === 4L)
    Resources.releaseCheckpoint(pinned)
  }

  test("per-round usage shape: chained rounds each one observed " +
      "checkpoint, signatures match recomputation") {
    import spark.implicits._
    var cur = Seq((5L, 1L), (4L, 1L), (3L, 1L)).toDF("u", "v")
    var sigs = List.empty[(Long, Long)]
    for (i <- 1 to 3) {
      val (next, st) = Tuning.checkpointWithStats(
        cur.withColumn("u", col("u") + 1L),
        count(lit(1)).cast("long").as("n"),
        sum(expr("hash(u, v)")).cast("long").as("h"))
      sigs ::= ((st("n").asInstanceOf[Long], st("h").asInstanceOf[Long]))
      if (i > 1) Resources.releaseCheckpoint(cur)
      cur = next
    }
    // recompute the final round's signature with a plain agg job
    val r = cur.agg(count(lit(1)).cast("long"),
      sum(expr("hash(u, v)")).cast("long")).head()
    assert(sigs.head === ((r.getLong(0), r.getLong(1))))
    assert(sigs.distinct.size === 3, "each round's frame differs")
    Resources.releaseCheckpoint(cur)
  }
}
