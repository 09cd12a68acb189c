package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q144's oracle pins bit-exact replay (training included); this spec
  * pins the report semantics: lift actually measures CONCENTRATION
  * (every surfaced term is over-represented in its cluster) and the
  * per-cluster ranking is well-formed. */
class ClusterTopicsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q144 surfaces over-represented terms with well-formed ranks") {
    val rows = SparkEntry.queries("q144_cluster_topics")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getInt(0)).foreach { case (cell, rs) =>
      val ranks = rs.map(_.getInt(1)).sorted.toSeq
      assert(ranks == (1 to rs.length) && rs.length <= 3,
        s"cell $cell ranks must be 1..k<=3, got $ranks")
      // lift ordering within the cluster is non-increasing
      val byRank = rs.sortBy(_.getInt(1)).map(_.getLong(4))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"cell $cell lift must be non-increasing")
      rs.foreach { r =>
        assert(r.getLong(3) >= 3L, "support floor c_ct >= 3")
        assert(r.getLong(5) > 0L, "cluster must contain documents")
      }
    }
    // a top term should CONCENTRATE: lift > 1 (> 1e6 micro-units) for
    // at least one cluster — a uniform corpus would flatline at 1e6
    assert(rows.exists(_.getLong(4) > 1000000L),
      "at least one term must be over-represented somewhere")
  }
}
