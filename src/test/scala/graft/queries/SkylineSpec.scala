package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q158 against an independent local dominance check: the naive O(n²)
  * pairwise skyline computed in plain Scala over the collected
  * (price, day) pairs must equal the distributed prefix-max result
  * exactly — including all ties on the frontier. */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("prefix-max skyline equals naive pairwise dominance") {
    val pts = Tables.raw(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"),
        expr("cast(unix_date(cast(o_orderdate as date)) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = pts.filter { case (_, p, d) =>
      !pts.exists { case (_, p2, d2) =>
        p2 >= p && d2 >= d && (p2 > p || d2 > d)
      }
    }.map(t => (t._1, t._2, t._3)).toSet
    assert(expected.nonEmpty)

    val got = SparkEntry.queries("q158_skyline")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == expected)
    // frontier property: sorted by price desc, days strictly increase
    // is NOT required (ties), but no member may dominate another
    got.foreach { case (_, p, d) =>
      got.foreach { case (_, p2, d2) =>
        assert(!(p2 >= p && d2 >= d && (p2 > p || d2 > d)))
      }
    }
    graft.Resources.releaseAll()
  }
}
