package graft.examples

import org.apache.spark.sql.SparkSession

/** Job-structure profile of the deploy-time artifact builds (the bench
  * warmup steps): per ensure*, wall seconds, job count, and total task
  * time — separates floor-bound builds (many tiny jobs: driver-side
  * scheduling, amortizes with data) from compute-bound ones (task time
  * ≈ wall × cores: real work). Usage:
  *   runMain graft.examples.WarmupProbe [sfDir]
  */
object WarmupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskInfo != null) {
            taskMs.addAndGet(e.taskInfo.duration); ()
          }
      })

    def probe(name: String)(body: => Unit): Unit = {
      val (j0, t0m) = (jobs.get(), taskMs.get())
      val t0 = System.nanoTime()
      try body
      catch { case e: Throwable => System.err.println(s"$name failed: $e") }
      Thread.sleep(80) // drain async listener events
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[warmup-probe] $name%-12s wall=$wall%6.2fs jobs=${
        jobs.get() - j0}%4d taskTime=${(taskMs.get() - t0m) / 1e3}%7.1fs")
    }

    graft.Bench.warmupSteps.foreach { case (name, step) =>
      probe(name)(step(spark, sfDir))
    }

    try graft.Resources.releaseAll()
    catch { case _: Throwable => () }
    spark.stop()
  }
}
