package graft.examples

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Diagnostic twin of two ScaleStress probes (agg, bloom) run in a
  * FRESH session with nothing else in the JVM: separates "the probe's
  * plan is superlinear" from "the 47-probe sweep's accumulated JVM
  * state (GC pressure, codegen volume) inflates late/large legs".
  * If the isolated ratios are clean while the sweep's are flagged,
  * the sweep is measuring its own residue, not the operator.
  *
  * {{{ sbt "runMain graft.examples.IsolatedProbe" }}}
  */
object IsolatedProbe {
  private def time(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime(); val n = f
    val r1 = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime(); f
    val r2 = (System.nanoTime() - t1) / 1e9
    (math.min(r1, r2), n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(df: DataFrame, copies: Int, keyCol: String,
        stride: Long): DataFrame =
      df.crossJoin(broadcast(spark.range(copies).toDF("copy")))
        .withColumn(keyCol, col(keyCol) + col("copy") * stride)
        .drop("copy")

    def aggRun(li: DataFrame): Long =
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(12,2)"))).as("rev"),
          count(lit(1)).as("n"))
        .collect().map(_.getAs[Long]("n")).sum

    def bloomRun(li: DataFrame): Long = {
      val bloom = udaf(graft.functions.BloomAgg)
      val bf = li.filter(col("l_quantity") >= 45).select(col("l_orderkey"))
        .agg(bloom(col("l_orderkey")).as("bf"))
      val admitted = (0 until 4).map { i =>
        val pos = s"pmod(h1 + $i * h2, 1048576)"
        s"(shiftright(element_at(bf, cast(shiftright($pos, 6) as int) + 1), " +
          s"cast(($pos & 63) as int)) & 1) = 1"
      }.mkString("(", ") AND (", ")")
      li.select(col("l_orderkey")).crossJoin(broadcast(bf))
        .withColumn("h1", expr(
          "cast(conv(substring(md5(cast(l_orderkey as string)), 1, 5), 16, 10) as bigint)"))
        .withColumn("h2", expr(
          "cast(conv(substring(md5(cast(l_orderkey as string)), 6, 5), 16, 10) as bigint)"))
        .filter(expr(admitted)).count()
    }

    val li1 = Tables.lineitem(spark, sfDir)
    val li10 = replicate(li1, 10, "l_orderkey", 1000000000L)
    aggRun(li1); bloomRun(li1) // warm JIT
    val (a1, _) = time(aggRun(li1))
    val (a10, _) = time(aggRun(li10))
    val (b1, _) = time(bloomRun(li1))
    val (b10, _) = time(bloomRun(li10))
    println(f"""{"metric":"isolated_probe","agg_1x_s":$a1%.2f,""" +
      f""""agg_10x_s":$a10%.2f,"bloom_1x_s":$b1%.2f,""" +
      f""""bloom_10x_s":$b10%.2f}""")
    spark.stop()
  }
}
