package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q157 against an independent local OLS: sufficient statistics and
  * the documented fixed-point slope/intercept replayed in plain Scala
  * over the recomputed hourly series, plus the least-squares sanity
  * check that the fitted slope sign matches the double-precision OLS
  * slope (the integer truncation must not flip the drift verdict). */
class OlsTrendSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("slope/intercept/forecast match a local replay") {
    import org.apache.spark.sql.functions._
    val hourly = graft.Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000L").as("hr"))
      .groupBy(col("event_type"), col("hr")).count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val series = hourly.groupBy(_._1)
    val rows = SparkEntry.queries("q157_ols_trend")(spark, sfDir)
      .collect()
    assert(rows.length == series.size)
    rows.foreach { r =>
      val pts = series(r.getString(0))
      val h0 = pts.map(_._2).min
      val xy = pts.map(p => (p._2 - h0, p._3))
      val n = xy.length.toLong
      val sx = xy.map(_._1).sum
      val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      val slope = 1000000L * (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val ic = (1000000L * sy - slope * sx) / n
      val xmax = xy.map(_._1).max
      assert(r.getAs[Long]("n_hours") == n)
      assert(r.getAs[Long]("slope_micro") == slope)
      assert(r.getAs[Long]("ic_micro") == ic)
      assert(r.getAs[Long]("fc_micro") == ic + slope * (xmax + 1))
      // truncation must not flip the drift verdict vs double OLS
      val dSlope = (n.toDouble * sxy - sx.toDouble * sy) /
        (n.toDouble * sxx - sx.toDouble * sx)
      assert(math.signum(slope.toDouble) == math.signum(dSlope) ||
        math.abs(dSlope) < 1e-6)
    }
  }

  test("a single-hour event type is dropped, not a DIVIDE_BY_ZERO") {
    // n = 1 ⇒ sx = sxx = 0 ⇒ the OLS denominator is 0; the n >= 2
    // guard must drop the group (the DuckDB oracle's HAVING does the
    // same) instead of letting ANSI div throw and kill the query.
    import org.apache.spark.sql.functions._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("ols-one-hour").toFile
    dir.deleteOnExit()
    val base = 1700000000000000L // µs epoch, hour-aligned enough
    val rows = Seq(
      // "fresh" seen in exactly one hour (two events, same hour)
      (1L, base, 1L, "fresh", 1.0, "{}"),
      (2L, base + 60L * 1000000L, 2L, "fresh", 1.0, "{}"),
      // "steady" spans three hours — survives the guard
      (3L, base, 3L, "steady", 1.0, "{}"),
      (4L, base + 3600L * 1000000L, 3L, "steady", 1.0, "{}"),
      (5L, base + 7200L * 1000000L, 3L, "steady", 1.0, "{}"))
    spark.createDataFrame(rows.map { case (id, us, u, t, v, p) =>
        (id, new java.sql.Timestamp(us / 1000L), u, t, v, p)
      })
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "events.parquet").getPath)
    val out = SparkEntry.queries("q157_ols_trend")(spark, dir.getPath)
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("steady"))
    assert(out.head.getAs[Long]("n_hours") == 3L)
  }
}
