package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q194 structural invariants + consistency with q190's bin table.
  * The DuckDB oracle replays the same algebra, so the value of this
  * spec is the cross-QUERY consistency legs (sweep totals must equal
  * the bin table's totals; thr_bin=0 must flag everything) and the
  * selection-rule pin (exactly one chosen row, max F1, lowest bin on
  * ties) — a shared algebra mistake in the F1 form would pass the
  * oracle but break the recomputed-F1 leg here. */
class ThresholdSelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val M = 1000000L

  test("sweep is consistent, F1 recomputes, chosen row is the max-F1 " +
      "lowest-bin operating point") {
    val rows = SparkEntry.queries("q194_threshold_selection")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9)))
      .sortBy(_._1)
    assert(rows.nonEmpty && rows.length <= 10)

    // constant totals across the sweep: P = tp+fn, N = fp+tn
    val p0 = rows.head._3 + rows.head._5
    val n0 = rows.head._4 + rows.head._6
    rows.foreach { case (b, _, tp, fp, fn, tn, _, _, _, _) =>
      assert(tp + fn === p0, s"bin $b: positives must be conserved")
      assert(fp + tn === n0, s"bin $b: negatives must be conserved")
    }
    // the lowest threshold flags every document
    assert(rows.head._1 === 0L)
    assert(rows.head._3 === p0 && rows.head._4 === n0,
      "thr_bin=0 must predict positive for the whole corpus")
    // monotone: raising the threshold can only drop flagged docs
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._3 <= a._3 && b._4 <= a._4,
          "tp and fp must be non-increasing in the threshold")
      case _ => ()
    }
    // F1/precision/recall recompute from the confusion (integer µ-units)
    rows.foreach { case (b, _, tp, fp, fn, _, prec, rec, f1, _) =>
      val expPrec = if (tp + fp > 0) tp * M / (tp + fp) else 0L
      val expRec = if (p0 > 0) tp * M / p0 else 0L
      val expF1 = if (tp + fp + p0 > 0) 2 * tp * M / (tp + fp + p0) else 0L
      assert(prec === expPrec && rec === expRec && f1 === expF1,
        s"bin $b: metric recompute mismatch")
      assert(fn === p0 - tp)
    }
    // selection rule: exactly one chosen; max F1; lowest bin on ties
    val chosen = rows.filter(_._10 == 1L)
    assert(chosen.length === 1, "exactly one operating point")
    val maxF1 = rows.map(_._9).max
    assert(chosen.head._9 === maxF1)
    assert(chosen.head._1 === rows.filter(_._9 == maxF1).map(_._1).min)

    // consistency with q190: same binning → same per-bin doc counts
    // (q190's n_docs summed == sweep totals)
    val binTable = SparkEntry.queries("q190_calibration_bins")(spark, sfDir)
      .collect()
    val totDocs = binTable.map(r => r.getLong(1)).sum
    val totPos = binTable.map(r => r.getLong(2)).sum
    assert(totDocs === p0 + n0, "sweep totals must equal the bin table's")
    assert(totPos === p0)
    graft.Resources.releaseAll()
  }
}
