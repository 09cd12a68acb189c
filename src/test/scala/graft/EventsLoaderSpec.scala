package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift guard for the canonical events loader. The driver has
  * regenerated `events.ts` as parquet TIMESTAMP(NANOS) in some rounds and
  * TIMESTAMP(MICROS) in others (the r5 flip broke 19 queries at analysis
  * time). This spec writes an events-shaped parquet in each physical
  * encoding the loader must handle — ns-since-epoch long (what the
  * `nanosAsLong` read of a NANOS fixture yields), TIMESTAMP_NTZ (a MICROS
  * fixture), and session-TZ TIMESTAMP — and asserts Tables.events /
  * Tables.eventsRaw produce bit-identical µs semantics for all three, so
  * a future fixture flip fails loudly here instead of across the suite. */
class EventsLoaderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 2024-01-15 12:34:56.789123456 UTC and friends, as ns since epoch
  private val nanos = Seq(
    1705322096789123456L, 1705322096789123999L, 1704067200000000000L,
    1706745599999999001L)
  private val expectedMicros = nanos.map(_ / 1000L)

  private def writeFixtures(): (String, String, String) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("events-loader").toString
    val base = nanos.zipWithIndex.map { case (ns, i) =>
      (i.toLong, (i % 2).toLong, "click", ns, i.toDouble)
    }.toDF("event_id", "user_id", "event_type", "ts", "value")
    val longPath = s"$dir/long/events.parquet"
    base.write.parquet(longPath)
    val ntzPath = s"$dir/ntz/events.parquet"
    base.withColumn("ts",
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      .write.parquet(ntzPath)
    val tzPath = s"$dir/tz/events.parquet"
    base.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .write.parquet(tzPath)
    (s"$dir/long", s"$dir/ntz", s"$dir/tz")
  }

  private def microsOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.orderBy(col("event_id"))
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq

  test("loader adapts to ns-long, TIMESTAMP_NTZ, and TIMESTAMP fixtures") {
    val (longDir, ntzDir, tzDir) = writeFixtures()
    for (d <- Seq(longDir, ntzDir, tzDir)) {
      val ev = Tables.events(spark, d)
      assert(ev.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType, s"dir=$d")
      assert(microsOf(ev) === expectedMicros, s"dir=$d")
      assert(microsOf(Tables.eventsRaw(spark, d)) === expectedMicros,
        s"raw dir=$d")
    }
  }

  test("loader is session-timezone-proof (non-UTC shell)") {
    // The NTZ branch used to rely on the ambient session TZ being UTC:
    // a bare NTZ→TIMESTAMP cast re-interprets the wall clock in the
    // session zone and would shift every µs count in a non-UTC shell.
    // Kolkata (+05:30, no DST) makes any residual offset visible and
    // avoids DST-transition ambiguity.
    val (longDir, ntzDir, tzDir) = writeFixtures()
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "Asia/Kolkata")
      for (d <- Seq(longDir, ntzDir, tzDir))
        assert(microsOf(Tables.events(spark, d)) === expectedMicros,
          s"dir=$d under Asia/Kolkata")
    } finally spark.conf.set(tzKey, prev)
  }

  test("the real fixture loads and matches its raw µs content") {
    val d = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, d)
    assert(ev.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(ev.count() > 0)
  }
}
