package graft.examples

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-benchmark: isolate the per-task fixed cost seen in the
  * superstep family (64-task stages at ~150ms/task over ~2k rows each).
  * Times a kcore-round-shaped job (union of two selects over a cached
  * frame → groupBy count) across partition counts and storage shapes.
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // core confs (fixed at context creation) under test:
    sys.env.get("MP_CODEC").foreach(c => b.config("spark.io.compression.codec", c))
    sys.env.get("MP_SHUFFLE_COMPRESS").foreach(c => b.config("spark.shuffle.compress", c))
    sys.env.get("MP_SPILL_COMPRESS").foreach(c => b.config("spark.shuffle.spill.compress", c))
    sys.env.get("MP_BYPASS").foreach(c => b.config("spark.shuffle.sort.bypassMergeThreshold", c))
    sys.env.get("MP_PAGESIZE").foreach(c => b.config("spark.buffer.pageSize", c))
    sys.env.get("MP_FILEBUF").foreach(c => b.config("spark.shuffle.file.buffer", c))
    val spark = b.getOrCreate()
    println(s"codec=${spark.conf.get("spark.io.compression.codec", "default")} " +
      s"shuffle.compress=${spark.conf.get("spark.shuffle.compress", "default")}")
    spark.sparkContext.setLogLevel("WARN")
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong
    val tasksN = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val cpuMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          cpuMs.addAndGet(m.executorCpuTime / 1000000)
          ()
        }
        tasksN.addAndGet(e.stageInfo.numTasks)
        ()
      }
    })

    val n = 124000L
    def round(e: org.apache.spark.sql.DataFrame): Long =
      e.select(col("x").as("n")).union(e.select(col("y").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 3).count()

    def time(label: String)(body: => Unit): Unit = {
      body // warm
      val t = (1 to 3).map { _ =>
        taskTimeMs.set(0); tasksN.set(0); gcMs.set(0); cpuMs.set(0)
        val t0 = System.nanoTime(); body
        ((System.nanoTime() - t0) / 1e6, taskTimeMs.get, tasksN.get,
          gcMs.get, cpuMs.get)
      }.minBy(_._1)
      println(f"$label%-40s wall=${t._1}%7.1f ms task_ms=${t._2}%6d " +
        f"tasks=${t._3}%4d gc_ms=${t._4}%5d cpu_ms=${t._5}%6d")
    }

    val base = spark.range(n).select(
      (col("id") % 7919).as("x"), (col("id") % 6007).as("y"))

    for (p <- Seq(32, 8, 4)) {
      val cached = base.repartition(p).persist()
      cached.count()
      time(s"cached p=$p union-agg-count")(round(cached))
      cached.unpersist()
    }
    val ck = base.repartition(32).localCheckpoint()
    time("localCheckpoint p=32 union-agg-count")(round(ck))
    val ck4 = base.repartition(4).localCheckpoint()
    time("localCheckpoint p=4 union-agg-count")(round(ck4))
    // AQE off comparison
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val ck32b = base.repartition(32).localCheckpoint()
    time("AQE-off localCheckpoint p=32")(round(ck32b))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // shuffle partitions influence
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    time("shufflePartitions=4 ck p=32")(round(ck))
    spark.conf.set("spark.sql.shuffle.partitions", cpus)
    spark.stop()
  }
}
