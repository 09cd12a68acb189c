package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** File-format breadth for the scan surface (SURVEY §2.2 scans row):
  * the same relation read back from CSV and JSON-lines dumps must match
  * the parquet original column-for-column, including the type fidelity
  * traps each format carries (CSV strings→typed columns via explicit
  * schema; JSON longs; µs timestamps via ISO strings). A 100 TB lake is
  * never all parquet — landing zones arrive as CSV/JSONL and the engine
  * must scan them with pushdown-capable readers (both sources support
  * filter pushdown and schema pruning in Spark). */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsus"),
        col("value").cast("decimal(12,2)").as("v"))
      .orderBy(col("event_id")).collect().toSeq

  test("events survive a CSV round-trip with an explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("fmt-csv").toString
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        // ISO-format µs so the string form is lossless and sortable
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("value"))
    ev.write.option("header", "true").csv(s"$dir/events")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("ts", TimestampType),
      StructField("value", DoubleType)))
    val back = spark.read.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .schema(schema).csv(s"$dir/events")
    assert(canon(back) == canon(Tables.events(spark, sfDir)))
  }

  test("events survive a JSON-lines round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("fmt-json").toString
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("value"))
      .write.json(s"$dir/events")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("ts", TimestampType),
      StructField("value", DoubleType)))
    val back = spark.read
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .schema(schema).json(s"$dir/events")
    assert(canon(back) == canon(Tables.events(spark, sfDir)))
  }

  test("csv filter pushdown reaches the scan") {
    val dir = java.nio.file.Files.createTempDirectory("fmt-push").toString
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type")).write
      .option("header", "true").csv(s"$dir/e")
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("event_type", StringType)))
    val df = spark.read.option("header", "true").schema(schema)
      .csv(s"$dir/e").filter(col("event_type") === "click")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(event_type,click)"),
      s"csv scan must carry the pushed filter, plan:\n${plan.take(800)}")
    assert(df.count() > 0)
  }
}
