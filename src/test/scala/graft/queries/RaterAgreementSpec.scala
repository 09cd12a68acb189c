package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q174 against an independent local κ computation (both raters, the
  * confusion counts, and Cohen's formula in BigInt), plus the degenerate
  * pe = 1 convention. */
class RaterAgreementSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def raters(text: String): (Long, Long) = {
    val tk = text.split(" ").filter(_.nonEmpty)
    val n = tk.length.toLong
    val chars = tk.map(_.length.toLong).sum
    val ra = n >= 30 && n <= 5000 && chars * 10 >= n * 30 &&
      chars * 10 <= n * 120
    val rb = n >= 20 && tk.distinct.length.toLong * 10 >= n * 3
    (if (ra) 1L else 0L, if (rb) 1L else 0L)
  }

  private def kappa(n: Long, agree: Long, yesA: Long,
      yesB: Long): (Long, Long) = {
    val pe2 = BigInt(yesA) * yesB + BigInt(n - yesA) * (n - yesB)
    val po = BigInt(agree) * 1000000 / n
    val den = BigInt(n) * n - pe2
    val k = if (den == 0) BigInt(1000000)
      else (BigInt(agree) * n - pe2) * 1000000 / den
    (po.toLong, k.toLong)
  }

  test("fixture replay matches the local κ computation per source") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), raters(r.getString(1))))
    val groups = docs.groupBy(_._1).map { case (src, xs) =>
      val n = xs.length.toLong
      val agree = xs.count(x => x._2._1 == x._2._2).toLong
      val ya = xs.map(_._2._1).sum
      val yb = xs.map(_._2._2).sum
      src -> ((n, agree, ya, yb))
    }
    val allN = docs.length.toLong
    val all = ("*ALL*", (allN, docs.count(x => x._2._1 == x._2._2).toLong,
      docs.map(_._2._1).sum, docs.map(_._2._2).sum))
    val exp = (groups + all).map { case (src, (n, a, ya, yb)) =>
      val (po, k) = kappa(n, a, ya, yb)
      src -> ((n, a, ya, yb, po, k))
    }
    val got = SparkEntry.queries("q174_rater_agreement")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    assert(got == exp)
    // the readout must be non-degenerate: agreement above chance but
    // below perfect somewhere (otherwise the fixture tests nothing)
    val allK = got("*ALL*")._6
    assert(allK > -1000000L && allK <= 1000000L)
  }

  test("pe = 1 (both raters constant and equal) reports κ = 1e6") {
    val dir = Files.createTempDirectory("kappa").toFile
    dir.deleteOnExit()
    // 40-token docs with 4-char words: both raters keep EVERYTHING →
    // agree = n, yes = n for both → pe2 = n² → the guard branch
    val text = (1 to 40).map(i => f"w$i%03d").mkString(" ")
    spark.createDataFrame(
        (1L to 5L).map(id => (id, "en", "srcA", text)))
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "documents.parquet").getPath)
    val got = SparkEntry.queries("q174_rater_agreement")(spark, dir.getPath)
      .collect()
      .map(r => r.getString(0) -> r.getLong(6)).toMap
    assert(got == Map("srcA" -> 1000000L, "*ALL*" -> 1000000L))
  }
}
