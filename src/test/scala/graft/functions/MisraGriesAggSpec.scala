package graft.functions

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries summary's guarantees and the q166 two-pass contract:
  * the superset property (no heavy item ever missing, under any merge
  * order), the undercount bound, and partitioning-invariance of the
  * FINAL query output (the sketch itself may vary; the recounted set
  * must not). */
class MisraGriesAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def mgLocal(xs: Seq[Long]): Map[Long, Long] =
    xs.foldLeft(Map.empty[Long, Long])(MisraGriesAgg.reduce)

  test("superset property on a skewed stream, single partial") {
    val k = MisraGriesAgg.K
    // 3 heavy ids drowned in 400 distinct light ids (> K−1 counters)
    val heavy = Seq.fill(300)(1L) ++ Seq.fill(250)(2L) ++ Seq.fill(200)(3L)
    val light = (100L until 500L).flatMap(i => Seq(i, i))
    val xs = new scala.util.Random(3).shuffle(heavy ++ light)
    val n = xs.length
    val buf = mgLocal(xs)
    val exact = xs.groupBy(identity).map { case (x, o) => x -> o.length.toLong }
    exact.foreach { case (x, c) =>
      if (c * k > n)
        assert(buf.contains(x), s"heavy id $x (count $c, n $n) missing")
      // undercount bound: kept estimate within N/K of truth
      buf.get(x).foreach(est =>
        assert(est <= c && c - est <= n.toLong / k, s"id $x est $est true $c"))
    }
  }

  test("merge keeps the superset property under arbitrary split points") {
    val k = MisraGriesAgg.K
    val heavy = Seq.fill(500)(7L) ++ Seq.fill(450)(8L)
    val light = (1000L until 1400L).map(identity)
    val xs = new scala.util.Random(11).shuffle(heavy ++ light ++ light)
    val n = xs.length
    for (cut <- Seq(1, n / 3, n / 2, n - 2)) {
      val (a, b) = xs.splitAt(cut)
      val merged = MisraGriesAgg.merge(mgLocal(a), mgLocal(b))
      assert(merged.size <= k - 1)
      assert(merged.contains(7L) && merged.contains(8L), s"cut=$cut")
    }
    // deeper tree: 8-way split merged pairwise
    val parts = xs.grouped(math.max(1, n / 8)).map(mgLocal).toSeq
    val treeMerged = parts.reduce(MisraGriesAgg.merge)
    assert(treeMerged.contains(7L) && treeMerged.contains(8L))
  }

  test("q166 output is partitioning-invariant and exactly thresholded") {
    val base = SparkEntry.queries("q166_heavy_hitters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(base.nonEmpty, "fixture must contain heavy users")
    // exact reference from a plain count
    val ev = graft.Tables.eventsRaw(spark, sfDir)
    val n = ev.count()
    val exact = ev.groupBy(col("user_id")).count()
      .filter(col("count") * MisraGriesAgg.K > n)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(base.map(_._1) == exact.keySet)
    base.foreach { case (u, c, ppm) =>
      assert(exact(u) == c)
      assert(ppm == c * 1000000L / n)
    }
    // the sketch pass under a hostile partitioning must recount to the
    // same set (the candidate SET may differ; the OUTPUT may not)
    val repart = ev.repartition(17, col("event_id"))
    val mg = udaf(MisraGriesAgg)
    val cand = repart.agg(mg(col("user_id"))).head().getSeq[Long](0)
    assert(exact.keySet.subsetOf(cand.toSet),
      "superset property must hold under repartitioning")
  }
}
