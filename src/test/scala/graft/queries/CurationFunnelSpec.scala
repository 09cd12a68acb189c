package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q164 against a local replay of every stage rule (quality bounds,
  * q33-pair dedup drop, md5 split + any-shared-8-span
  * decontamination), plus the funnel's monotonicity — each stage may
  * only shrink the survivor set. */
class CurationFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("funnel stages replay locally and shrink monotonically") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.map { case (id, t) =>
      id -> t.split(" ").filter(_.nonEmpty).toSeq
    }.toMap
    def h(id: Long) =
      java.lang.Long.parseLong(md5hex(id.toString).take(4), 16) % 10
    val base = toks.keySet
    val s1 = base.filter { id =>
      val n = toks(id).length.toLong
      val chars = toks(id).map(_.length.toLong).sum
      n >= 20 && n <= 2000 && chars * 10 >= n * 38 && chars * 10 <= n * 120
    }
    // dedup drop: q33's verified pairs are (doc1 < doc2); doc2 has a
    // smaller verified partner
    val dupDropped = SparkEntry.queries("q33_ngram_jaccard")(spark, sfDir)
      .select(col("doc2")).collect().map(_.getLong(0)).toSet
    val s2 = s1 -- dupDropped
    def spans(id: Long): Set[String] = {
      val tk = toks(id)
      (0 to tk.length - 8)
        .map(i => md5hex(tk.slice(i, i + 8).mkString(" ")).take(16)).toSet
    }
    val evalSpans = base.filter(h(_) >= 8).flatMap(spans)
    val s3 = s2.filter(id =>
      h(id) < 8 && spans(id).intersect(evalSpans).isEmpty)

    def expect(ids: Set[Long]) =
      (ids.size.toLong, ids.toSeq.map(toks(_).length.toLong).sum)
    val got = SparkEntry.queries("q164_curation_funnel")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("0_corpus") == expect(base))
    assert(got("1_quality") == expect(s1))
    assert(got("2_dedup") == expect(s2))
    assert(got("3_decontam") == expect(s3))
    // monotone funnel, and every stage must actually filter something
    // on the fixture (the corpus plants near-dups and quality outliers)
    val order = Seq("0_corpus", "1_quality", "2_dedup", "3_decontam")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(got(a)._1 > got(b)._1, s"$a -> $b must shrink")
      assert(got(a)._2 > got(b)._2)
    }
    graft.Resources.releaseAll()
  }
}
