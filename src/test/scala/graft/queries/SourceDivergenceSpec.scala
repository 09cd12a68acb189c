package graft.queries

import java.nio.file.Files

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q177 against an independent BigInt replay of the total-variation
  * identity (including the absent-terms residual), plus the two
  * boundary cases that pin the formula: an identically-distributed
  * source diverges 0, a disjoint-vocabulary source diverges
  * (T − T_s)/T exactly. */
class SourceDivergenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def tvPpm(counts: Map[(String, String), Long]): Map[String, Long] = {
    val bySource = counts.groupBy(_._1._1)
      .map { case (s, m) => s -> m.map { case ((_, w), c) => w -> c } }
    val corpus = counts.groupBy(_._1._2)
      .map { case (w, m) => w -> m.values.sum }
    val t = BigInt(corpus.values.sum)
    bySource.map { case (s, cw) =>
      val ts = BigInt(cw.values.sum)
      val present = cw.map { case (w, c) =>
        (BigInt(c) * t - BigInt(corpus(w)) * ts).abs
      }.sum
      // toSeq first: mapping corpus counts over the KEY SET would
      // collapse equal counts before summing
      val massPresent = cw.keys.toSeq.map(corpus).sum
      val num = present + ts * (t - massPresent)
      s -> (num * 1000000 / (2 * ts * t)).toLong
    }
  }

  private def tokenCounts(rows: Seq[(String, String)]) =
    rows.flatMap { case (s, text) =>
      text.split(" ").filter(_.nonEmpty).map(w => (s, w))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }

  test("fixture replay matches the BigInt identity per source") {
    val rows = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val exp = tvPpm(tokenCounts(rows))
    val got = SparkEntry.queries("q177_source_divergence")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == exp)
    // and the readout is non-degenerate on the fixture
    assert(got.values.exists(_ > 0L))
  }

  test("identical distribution → 0; disjoint vocabulary → (T−T_s)/T") {
    val dir = Files.createTempDirectory("tvdiv").toFile
    dir.deleteOnExit()
    // same: two sources with the SAME multiset of tokens per doc;
    // alien: a third source sharing no token with anyone
    val docs = Seq(
      (1L, "en", "same_a", "x x y z"),
      (2L, "en", "same_b", "x x y z"),
      (3L, "en", "alien", "q q q r"))
    spark.createDataFrame(docs)
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "documents.parquet").getPath)
    val got = SparkEntry.queries("q177_source_divergence")(
        spark, dir.getPath)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // T = 12, each source T_s = 4. same_a vs corpus: p_s(x)=1/2 vs
    // p(x)=1/3, p_s(y)=1/4 vs 1/6, p_s(z)=1/4 vs 1/6, absent q,r mass
    // 4/12 → tv = (1/6 + 1/12 + 1/12 + 1/3)/2 = 1/3
    assert(got("same_a") == ((4L, 333333L)))
    assert(got("same_b") == ((4L, 333333L)))
    // disjoint: tv = (T − T_s)/T = 8/12 exactly
    assert(got("alien") == ((4L, 666666L)))
    // cross-check with the local replay
    val exp = tvPpm(tokenCounts(docs.map(d => (d._3, d._4))))
    assert(got.map { case (s, (_, tv)) => s -> tv } == exp)
  }
}
