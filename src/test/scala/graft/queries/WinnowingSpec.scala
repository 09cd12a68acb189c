package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q145 against an INDEPENDENT Scala reimplementation of winnowing
  * (Schleimer et al. '03), plus the paper's coverage guarantee. The
  * oracle already pins DuckDB equivalence; this pins that both engines
  * implement the algorithm we think they do (a shared misreading of
  * slice/range semantics would survive the oracle but not this). */
class WinnowingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Reference model: raw split, 3-token shingles, first-8-hex-chars
    * hash, w=4 window minima, distinct+sorted. */
  private def winnow(text: String): (Int, Seq[Long]) = {
    val toks = text.split(" ", -1)
    val shingles =
      if (toks.length >= 3)
        (0 to toks.length - 3).map(i =>
          s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}")
      else Seq.empty[String]
    val sh = shingles.map(g => java.lang.Long.parseLong(
      md5hex(g).take(8), 16))
    val sel =
      if (sh.length >= 4) (0 to sh.length - 4).map(i => sh.slice(i, i + 4).min)
      else if (sh.nonEmpty) Seq(sh.min)
      else Seq.empty[Long]
    (sh.length, sel.distinct.sorted)
  }

  test("q145 matches the reference model doc-for-doc") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("q145_winnowing")(spark, sfDir).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val (nSh, fps) = winnow(docs(r.getLong(0)))
      assert(r.getInt(1) == nSh, s"doc ${r.getLong(0)} n_shingles")
      assert(r.getInt(2) == fps.length, s"doc ${r.getLong(0)} n_fp")
      if (fps.nonEmpty) {
        assert(r.getLong(3) == fps.head, s"doc ${r.getLong(0)} fp_min")
        assert(r.getLong(4) == fps.last, s"doc ${r.getLong(0)} fp_max")
      }
      assert(r.getString(5) == md5hex(fps.mkString(",")),
        s"doc ${r.getLong(0)} fp_digest")
    }
  }

  test("winnowing coverage guarantee: every w-window contributes") {
    // on random token streams, any 4 consecutive shingles must share a
    // value with the fingerprint set — the property that makes partial
    // overlap detectable
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val n = 3 + rnd.nextInt(60)
      val text = Seq.fill(n)(s"w${rnd.nextInt(12)}").mkString(" ")
      val toks = text.split(" ", -1)
      val sh = (0 to toks.length - 3).map(i =>
        java.lang.Long.parseLong(
          md5hex(s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}").take(8), 16))
      val (_, fps) = winnow(text)
      val fpSet = fps.toSet
      if (sh.length >= 4)
        (0 to sh.length - 4).foreach { i =>
          assert(sh.slice(i, i + 4).exists(fpSet.contains),
            s"window $i has no fingerprint")
        }
      else assert(sh.isEmpty || sh.exists(fpSet.contains))
    }
  }
}
