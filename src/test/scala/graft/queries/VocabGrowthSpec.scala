package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q169's curve against an independent local replay plus its algebraic
  * invariants (cumulative sum telescopes to the total distinct-type
  * count; the opening decile dominates any later one on a stationary
  * corpus is NOT assumed — only exact replay is). */
class VocabGrowthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("deciles replay a local first-occurrence fold") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val n = docs.length.toLong
    def grams(t: String): Seq[String] = {
      val tk = t.split(" ").filter(_.nonEmpty)
      if (tk.length < 3) Seq.empty
      else (0 to tk.length - 3).map(i => tk.slice(i, i + 3).mkString(" "))
    }
    val firstDoc = docs.flatMap { case (id, t) =>
      grams(t).distinct.map(_ -> id)
    }.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).min }
    val expected = (0L until 10L).map { dec =>
      dec -> firstDoc.values.count(f => math.min(9L, f * 10 / n) == dec).toLong
    }.toMap
    val got = SparkEntry.queries("q169_vocab_growth")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == (0L until 10L))
    got.foreach { case (dec, nt, _) =>
      assert(nt == expected(dec), s"decile $dec")
    }
    // cumsum telescopes to the distinct type count
    assert(got.last._3 == firstDoc.size.toLong)
    assert(got.map(_._2).sum == got.last._3)
    // curve must be non-trivial on the fixture
    assert(got.count(_._2 > 0) >= 2)
  }
}
