package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q162 against a local replay from q77's own oracle-verified top-10:
  * grade each hit from its n_hit, fold the exact 2^-r weights, re-rank
  * best-first for the ideal — bit-for-bit, plus the metric's algebraic
  * invariants (rbp ≤ ideal ≤ the all-perfect bound). */
class RbpEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("rbp/ideal replay q77's ranking exactly") {
    val nTerms = TextAnalysis.BmQueries
      .map { case (q, t) => q.toLong -> t.split(" ").length.toLong }.toMap
    val top = SparkEntry.queries("q77_bm25_retrieval")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0).toLong, r.getInt(1), r.getAs[Long]("n_hit")))
      .groupBy(_._1)
    val rows = SparkEntry.queries("q162_rbp_ranking_eval")(spark, sfDir)
      .collect()
    assert(rows.map(_.getInt(0).toLong).toSeq == top.keys.toSeq.sorted)
    rows.foreach { r =>
      val q = r.getInt(0).toLong
      val hits = top(q).sortBy(_._2)
      val grades = hits.map { case (_, rank, nh) =>
        (rank, if (nh == nTerms(q)) 2L else 1L)
      }
      val rbp = grades.map { case (rank, rel) =>
        (rel << 20) / (1L << rank)
      }.sum
      val ideal = grades.sortBy { case (rank, rel) => (-rel, rank) }
        .zipWithIndex.map { case ((_, rel), i) =>
          (rel << 20) / (1L << (i + 1))
        }.sum
      assert(r.getLong(1) == rbp, s"q$q rbp")
      assert(r.getLong(2) == ideal, s"q$q ideal")
      assert(r.getLong(3) == grades.count(_._2 == 2L), s"q$q full hits")
      assert(rbp <= ideal, "re-ranking best-first can only help")
      // all-perfect bound: ten rel=2 hits at ranks 1..10
      assert(ideal <= (1 to 10).map(r0 => (2L << 20) / (1L << r0)).sum)
    }
    graft.Resources.releaseAll()
  }
}
