package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q156 against an independent local Holt fold: hourly counts are
  * recomputed from the loaded events table and the (level, trend)
  * recurrence replayed in plain Scala with explicit
  * truncate-toward-zero halving, then compared bit-for-bit. (The
  * DuckDB oracle had to avoid list_reduce here — its struct
  * accumulators drift past the first step on 1.0 — so this spec is
  * the second independent check on the fold itself.) */
class HoltForecastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("fold matches a local integer Holt replay; forecasts are linear") {
    import org.apache.spark.sql.functions._
    val hourly = graft.Tables.events(spark, sfDir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 3600000000L").as("hr"))
      .groupBy(col("event_type"), col("hr")).count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val series = hourly.groupBy(_._1).map { case (t, rows) =>
      t -> rows.sortBy(_._2).map(_._3)
    }
    assert(series.nonEmpty)
    def replay(ys: Seq[Long]): (Long, Long) = {
      var l = ys.head * 1000000L
      var t = 0L
      for (y <- ys.tail) {
        val l2 = (y * 1000000L + l + t) / 2
        t = ((l2 - l) + t) / 2
        l = l2
      }
      (l, t)
    }
    val rows = SparkEntry.queries("q156_holt_forecast")(spark, sfDir)
      .collect()
    assert(rows.length == series.size)
    rows.foreach { r =>
      val (l, t) = replay(series(r.getString(0)))
      assert(r.getAs[Long]("n_hours") == series(r.getString(0)).length)
      assert(r.getAs[Long]("level_micro") == l)
      assert(r.getAs[Long]("trend_micro") == t)
      assert(r.getAs[Long]("fc1_micro") == l + t)
      assert(r.getAs[Long]("fc2_micro") == l + 2 * t)
      assert(r.getAs[Long]("fc3_micro") == l + 3 * t)
    }
  }
}
