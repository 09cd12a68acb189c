package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q147's oracle pins hop-for-hop replay; this spec pins that the
  * walks are WALKS: complete (every walk has all steps — the
  * co-purchase relation is symmetric, so no walk strands), valid
  * (every consecutive pair is a real co-purchase edge), and
  * deterministic across runs. */
class RandomWalkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q147 walks are complete, edge-valid, and deterministic") {
    import org.apache.spark.sql.functions._
    val run1 = SparkEntry.queries("q147_random_walks")(spark, sfDir)
      .collect()
    val run2 = SparkEntry.queries("q147_random_walks")(spark, sfDir)
      .collect()
    assert(run1.toSeq == run2.toSeq, "re-run must be identical")
    assert(run1.nonEmpty)

    // independent edge set: high-volume co-purchase pairs
    val li = graft.Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") >= 35)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val edges = li.select(col("ok"), col("pk").as("x"))
      .join(li.select(col("ok").as("ok2"), col("pk").as("y")),
        col("ok") === col("ok2") && col("x") =!= col("y"))
      .select(col("x"), col("y")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    run1.groupBy(_.getLong(0)).foreach { case (wid, rows) =>
      val path = rows.sortBy(_.getInt(1))
      assert(path.map(_.getInt(1)).toSeq == (0 to 4),
        s"walk $wid must have steps 0..4")
      assert(path.head.getLong(2) == wid, "walks start at their own id")
      path.sliding(2).foreach {
        case Array(a, b) =>
          assert(edges.contains((a.getLong(2), b.getLong(2))),
            s"walk $wid hop ${a.getLong(2)}->${b.getLong(2)} is not an edge")
        case _ => ()
      }
    }
  }
}
