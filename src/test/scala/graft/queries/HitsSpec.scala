package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q155 against an independent local HITS replay (collected sf0.001
  * edges, plain Scala maps) plus the normalization invariants: every
  * score sits in (0, 1e6], and each round's maximum lands exactly at
  * 1e6 (integer max-normalization fixes the top at the scale). */
class HitsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("hub/authority scores match a local integer replay") {
    val edges = Tables.raw(spark, sfDir, "orders")
      .join(Tables.raw(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long"), col("l_suppkey").cast("long"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    var hub = edges.map(_._1).distinct.map(_ -> 1000000L).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to 2) {
      val ar = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => hub(e._1)).sum
      }
      val amax = ar.values.max
      auth = ar.map { case (d, a) => d -> a * 1000000L / amax }
      val hr = edges.groupBy(_._1).map { case (s, es) =>
        s -> es.map(e => auth(e._2)).sum
      }
      val hmax = hr.values.max
      hub = hr.map { case (s, h) => s -> h * 1000000L / hmax }
    }

    val rows = SparkEntry.queries("q155_hits")(spark, sfDir).collect()
    val gotAuth = rows.filter(_.getString(0) == "s")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val gotHub = rows.filter(_.getString(0) == "c")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(gotAuth == auth)
    assert(gotHub == hub)
    assert(gotAuth.values.max == 1000000L)
    assert(gotHub.values.max == 1000000L)
    assert(rows.forall(r => r.getLong(2) > 0 && r.getLong(2) <= 1000000L))
    graft.Resources.releaseAll()
  }
}
