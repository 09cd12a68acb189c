package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q161's no-leakage invariant, proven pair-by-pair: every verified
  * near-dup pair (q33's contract — the edges the clustering ran on)
  * must land on the SAME side of the train/val/test boundary, and the
  * per-split aggregates must equal a local replay of the hash rule
  * over q65's own cluster labels. */
class LeakageSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def splitOf(cluster: Long): String = {
    val b = java.lang.Long.parseLong(md5hex(cluster.toString).take(4), 16) % 10
    if (b <= 7) "train" else if (b == 8) "val" else "test"
  }

  test("near-dup pairs never straddle a split; aggregates replay") {
    val labels = SparkEntry.queries("q65_dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = SparkEntry.queries("q33_ngram_jaccard")(spark, sfDir)
      .select(col("doc1"), col("doc2")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain verified near-dups")
    pairs.foreach { case (a, b) =>
      assert(splitOf(labels(a)) == splitOf(labels(b)),
        s"pair ($a, $b) straddles the split boundary")
    }
    // all three splits must actually materialize on the fixture
    val lens = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bySplit = labels.toSeq.groupBy { case (_, c) => splitOf(c) }
    assert(bySplit.keySet == Set("train", "val", "test"))
    val expected = bySplit.map { case (sp, members) =>
      sp -> ((members.size.toLong,
        members.map(_._2).distinct.size.toLong,
        members.map { case (d, _) => lens(d) }.sum))
    }
    val got = SparkEntry.queries("q161_leakage_safe_split")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // train must dominate (8/10 hash buckets) — the split is a split,
    // not an arbitrary 3-way partition
    assert(got("train")._1 > got("val")._1 &&
      got("train")._1 > got("test")._1)
    graft.Resources.releaseAll()
  }
}
