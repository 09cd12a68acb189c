package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q198 structural invariants (value-level parity is the DuckDB
  * oracle's job — it replays training, assignment, centroid recompute,
  * cell ranking and every scored pair bit-for-bit): candidate sets are
  * ranked-cell PREFIXES, so recall is provably monotone in nprobe — a
  * global-top-5 member present among candidates can only be outscored
  * by other global-top-5 members, so it never leaves the pruned top-5;
  * scanned rows grow strictly (cells are non-empty); ppm arithmetic
  * replays. */
class IvfProbeSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("recall monotone in nprobe, scan cost strictly growing") {
    val rows = SparkEntry.queries("q198_ivf_probe_sweep")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 4L))
    rows.foreach { case (np, nProbes, hits, ppm, scanned) =>
      assert(nProbes == 20L, s"np=$np probe count")
      assert(hits >= 0L && hits <= nProbes * 5, s"np=$np hits range")
      assert(ppm == hits * 1000000L / (nProbes * 5), s"np=$np ppm")
      assert(scanned > 0L, s"np=$np must scan something")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3,
        "recall must be monotone in nprobe (candidate prefixes nest)")
      assert(b._5 > a._5, "more cells must mean more scanned rows")
    }
    // the budget buys something on this fixture: the sweep must not be
    // flat (all-equal recalls would mean the cells carry no signal)
    assert(rows.last._3 > rows.head._3,
      "nprobe=4 must recover more of the exact top-5 than nprobe=1")
  }
}
