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
}
