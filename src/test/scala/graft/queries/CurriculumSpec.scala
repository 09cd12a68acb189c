package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q143's oracle pins bit-exact replay; this spec pins the binning
  * invariants that make the report USABLE as a sampler input: the bins
  * partition the corpus, their score ranges are disjoint and ordered,
  * and quartile cuts put roughly a quarter of docs in each bin. */
class CurriculumSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q143 bins partition the corpus with ordered, disjoint ranges") {
    val rows = SparkEntry.queries("q143_quality_curriculum")(spark, sfDir)
      .collect().sortBy(_.getInt(0))
    assert(rows.nonEmpty && rows.length <= 4)
    val total = rows.map(_.getLong(1)).sum
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(total == nDocs, s"bins must cover all $nDocs docs, got $total")
    // ranges STRICTLY disjoint across ascending bins: binning is a
    // strict `<` against shared cut literals, so a score can never land
    // in two bins — lo.max must sit strictly below hi.min
    rows.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getLong(4) < hi.getLong(3),
          s"bin ${lo.getInt(0)} max must be < bin ${hi.getInt(0)} min")
      case _ => ()
    }
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4), s"min<=max violated: $r")
      assert(r.getLong(2) >= r.getLong(1), "tok_mass >= n_docs (docs tokenize)")
    }
    // quartile cuts: no bin may hold the majority unless scores are
    // massively tied (they aren't in the fixtures)
    assert(rows.map(_.getLong(1)).max <= (nDocs * 2) / 3,
      "quartile binning must spread the corpus")
  }
}
