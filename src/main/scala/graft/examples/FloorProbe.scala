package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures Spark's fixed PER-QUERY floor under the exact Bench harness
  * conditions (local[32], AQE, noop sink): three trivial plans — a
  * 5-row scan, a 25-row aggregate, a broadcast join of both — each of
  * which DuckDB answers in ~1 ms, timed warm. Whatever these cost is
  * planning + codegen + job/stage scheduling, not data processing, and
  * it is paid once per query REGARDLESS of data size — so at sf0.1 a
  * 161-query bench carries ~161× this floor as pure fixed cost, while
  * at 100 TB the same floor amortizes to nothing. The engine-vs-oracle
  * wall-clock ratio should be read with `161 × floor` subtracted from
  * the engine side (NOTES.md round 8 records the decomposition).
  *
  * {{{ sbt "runMain graft.examples.FloorProbe" }}}
  */
object FloorProbe {
  /** Runs the three trivial plans under the caller's (bench) session and
    * returns kind → warm median seconds. Shared with graft.Bench so the
    * bench artifact carries its own floor denominator. */
  def measure(spark: SparkSession, sfDir: String): Seq[(String, Double)] = {
    def once(kind: String): Double = {
      val t0 = System.nanoTime()
      val df = kind match {
        case "scan" => graft.Tables.table(spark, sfDir, "region")
        case "agg" => graft.Tables.table(spark, sfDir, "nation")
          .groupBy(col("n_regionkey")).count()
        case _ => graft.Tables.table(spark, sfDir, "nation")
          .join(broadcast(graft.Tables.table(spark, sfDir, "region")),
            col("n_regionkey") === col("r_regionkey"))
      }
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    Seq("scan", "agg", "join").map { k =>
      val ts = (1 to 7).map(_ => once(k)).drop(2).sorted
      k -> ts(ts.length / 2)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.table(spark, sfDir, "region").count() // warm
    measure(spark, sfDir).foreach { case (k, m) =>
      println(f"floor $k%s: median=$m%.3f")
    }
    spark.stop()
  }
}
