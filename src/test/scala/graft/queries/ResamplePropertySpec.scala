package graft.queries

import graft.TestSpark
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence armor for q91's segment-explode rewrite. The DuckDB
  * oracle pins the fixture corpus at three SFs, but the fixtures carry
  * no NULL values and few degenerate shapes; this property check runs
  * the REWRITE (hash-agg last-per-hour → LOCF over the hourly frame →
  * half-open segment explode) against the naive REFERENCE formulation
  * (dense grid join + ignore-nulls running `last` window over the full
  * grid) on adversarial inputs — null values, single-event users,
  * multi-event hours with tie-adjacent timestamps, multi-day gaps —
  * and asserts identical output frames. This is the operator-level
  * proof that the segment form IS the window form, including the
  * null-LOCF semantics the fixtures never exercise.
  */
class ResamplePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val HourMicros = 3600L * 1000000L

  // (user, hourOffset, microInHour, eventId, value?) — hours bounded so
  // grids stay small, micro offsets allow same-hour collisions
  private val eventGen = for {
    user <- Gen.choose(0L, 4L)
    hour <- Gen.choose(0L, 40L)
    micro <- Gen.choose(0L, HourMicros - 1)
    value <- Gen.option(Gen.choose(-5, 5).map(_.toDouble))
  } yield (user, hour * HourMicros + micro, value)

  private val batchGen =
    Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, eventGen))

  // built via Row so `value` stays genuinely nullable
  private def eventsDf(
      rows: List[(Long, Long, Option[Double])]): DataFrame = {
    val data = rows.zipWithIndex.map { case ((u, micros, v), i) =>
      org.apache.spark.sql.Row(u, i.toLong,
        java.sql.Timestamp.from(java.time.Instant.EPOCH
          .plus(java.time.Duration.ofNanos(micros * 1000L))),
        v.map(Double.box).orNull)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 2),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType, nullable = false),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
  }

  /** The naive reference formulation (pre-r7 q91): dense per-user grid,
    * left join of last-per-hour, ignore-nulls running last over the
    * grid. */
  private def referenceResample(ev: DataFrame): DataFrame = {
    val wLast = Window.partitionBy(col("user_id"), col("hour"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val hourly = ev
      .withColumn("hour", date_trunc("hour", col("ts")))
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("hour"), col("value"))
    val grid = ev.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, INTERVAL 1 HOUR)")).as("hour"))
    val wFill = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("filled", last(col("value"), ignoreNulls = true)
        .over(wFill))
      .select(col("user_id"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("filled"), col("value").isNotNull.cast("int").as("had_event"))
  }

  /** The shipped q91 shape (EventAnalytics), inlined on an arbitrary
    * events frame. */
  private def segmentResample(ev: DataFrame): DataFrame = {
    val hourly = ev
      .withColumn("hour", date_trunc("hour", col("ts")))
      .groupBy(col("user_id"), col("hour"))
      .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
      .select(col("user_id"), col("hour"), col("m.value").as("value"))
    val wUser = Window.partitionBy(col("user_id")).orderBy(col("hour"))
    hourly
      .withColumn("filled", last(col("value"), ignoreNulls = true)
        .over(wUser.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("nxt", lead(col("hour"), 1).over(wUser))
      .select(col("user_id"), col("value"), col("filled"),
        col("hour").as("h0"),
        explode(expr("sequence(hour, " +
          "coalesce(nxt - INTERVAL 1 HOUR, hour), INTERVAL 1 HOUR)"))
          .as("hour"))
      .select(col("user_id"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("filled"),
        (col("hour") === col("h0") && col("value").isNotNull)
          .cast("int").as("had_event"))
  }

  private def canon(df: DataFrame): Seq[String] =
    df.select(col("user_id"), col("hour"), col("filled"),
        col("had_event"))
      .collect()
      .map(r => s"${r.get(0)}|${r.get(1)}|${r.get(2)}|${r.get(3)}")
      .sorted.toSeq

  test("segment explode ≡ grid join + ignore-nulls window, incl. nulls") {
    for (seed <- 1L to 12L) {
      val rows = sample(batchGen, seed)
      val ev = eventsDf(rows)
      val ref = canon(referenceResample(ev))
      val seg = canon(segmentResample(ev))
      assert(seg == ref,
        s"seed=$seed mismatch on ${rows.size} events:\nref=$ref\nseg=$seg")
    }
  }
}
