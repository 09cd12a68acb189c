package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q159 merge-rule invariants against q65's own cluster labels: every
  * consolidated record must describe exactly its cluster's members —
  * canonical = min id, keeper is a member whose text length is maximal
  * (ties to smallest id), counts and text mass add up, and singleton
  * clusters never ship. */
class GoldenRecordSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("survivorship rules hold cluster-by-cluster") {
    import org.apache.spark.sql.functions._
    val labels = SparkEntry.queries("q65_dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val lens = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = labels.groupBy(_._2).map { case (c, ms) =>
      c -> ms.map(_._1).sorted
    }
    val multi = clusters.filter(_._2.length >= 2)
    assert(multi.nonEmpty, "fixture must contain dup clusters")

    val rows = SparkEntry.queries("q159_golden_record")(spark, sfDir)
      .collect()
    assert(rows.length == multi.size)
    rows.foreach { r =>
      val c = r.getAs[Long]("cluster")
      val members = multi(c)
      assert(r.getAs[Long]("n_members") == members.length)
      assert(r.getAs[Long]("canonical_id") == members.min)
      assert(r.getAs[Long]("total_chars") == members.map(lens).sum)
      val keeper = r.getAs[Long]("keeper_id")
      assert(members.contains(keeper))
      val best = members.map(m => (lens(m), m))
        .minBy { case (l, id) => (-l, id) }._2
      assert(keeper == best,
        s"keeper $keeper != longest-text member $best of cluster $c")
    }
    graft.Resources.releaseAll()
  }
}
