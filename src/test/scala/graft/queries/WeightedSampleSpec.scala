package graft.queries

import java.nio.file.Files
import java.security.MessageDigest

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q176 against an independent local replay of the priority rule, plus
  * the weighting property the rule exists for: heavier docs win more
  * slots on a controlled synthetic corpus. */
class WeightedSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def h48(s: String): Long =
    java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12), 16)

  test("fixture replay matches the local bottom-K by (priority, id)") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val w = math.max(
          r.getString(1).split(" ").count(_.nonEmpty).toLong, 1L)
        val p = h48(r.getLong(0).toString) / w
        (r.getLong(0), w, p)
      }
    val exp = docs.sortBy(d => (d._3, d._1)).take(200).toSeq
    val got = SparkEntry.queries("q176_weighted_sample")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == exp)
  }

  test("heavier docs win proportionally more slots") {
    val dir = Files.createTempDirectory("wsample").toFile
    dir.deleteOnExit()
    // 400 docs: even ids carry 50 tokens, odd ids 1 token — a 50×
    // weight ratio. With K = 200 of 400 docs, the heavy half should
    // take the overwhelming majority of slots (each heavy priority is
    // h/50 vs h/1; P(heavy beats light) = 50/51 per pair).
    val docs = (1L to 400L).map { id =>
      val n = if (id % 2 == 0) 50 else 1
      (id, "en", "src", (1 to n).map(i => s"t${id}_$i").mkString(" "))
    }
    spark.createDataFrame(docs)
      .toDF("doc_id", "lang", "source", "text")
      .write.mode("overwrite")
      .parquet(new java.io.File(dir, "documents.parquet").getPath)
    val got = SparkEntry.queries("q176_weighted_sample")(spark, dir.getPath)
      .collect().map(_.getLong(0))
    assert(got.length == 200)
    val heavy = got.count(_ % 2 == 0)
    assert(heavy >= 170, s"only $heavy/200 slots went to 50×-weight docs")
  }
}
