package graft.queries

import graft.{TestSpark, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error envelopes for the sketch-based queries that (by design) have no
  * DuckDB hash oracle: q18 approx_count_distinct (HLL++) and q19
  * approx_percentile (quantile sketch). */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("approx_count_distinct within HLL++ error envelope") {
    val li = Tables.lineitem(spark, sfDir)
    val r = li.agg(
      approx_count_distinct(col("l_partkey")).as("approx"),
      countDistinct(col("l_partkey")).as("exact")).head()
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile close to exact percentile") {
    val li = Tables.lineitem(spark, sfDir)
    val r = li.agg(
      percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50a"),
      expr("percentile(l_quantity, 0.5)").as("p50e")).head()
    val (a, e) = (r.getDouble(0), r.getDouble(1))
    // quantity is integer-valued 1..50; the sketch at accuracy 10000 must
    // land within one unit of the exact interpolated median
    assert(math.abs(a - e) <= 1.0, s"approx=$a exact=$e")
  }
}
