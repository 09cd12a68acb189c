package graft.queries

import java.security.MessageDigest

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q175 against an independent local replay: per-source KMV sketches
  * (64 smallest distinct 48-bit hashes), union-by-merge estimates,
  * inclusion–exclusion intersection, and the exact token overlap. */
class SourceOverlapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def h48(w: String): Long =
    java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12), 16)

  private def est(mins: Seq[Long]): Long =
    if (mins.size < 64) mins.size.toLong
    else 63L * (1L << 48) / mins(63)

  test("fixture replay matches the local sketch algebra pair-for-pair") {
    val bySource = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).map { case (s, xs) =>
        s -> xs.flatMap(_._2.split(" ")).filter(_.nonEmpty).toSet
      }
    val sketches = bySource.map { case (s, ws) =>
      s -> ws.map(h48).toSeq.sorted.take(64)
    }
    val srcs = bySource.keys.toSeq.sorted
    val exp = (for {
      i <- srcs.indices; j <- i + 1 until srcs.length
    } yield {
      val (a, b) = (srcs(i), srcs(j))
      val (ea, eb) = (est(sketches(a)), est(sketches(b)))
      val merged = (sketches(a) ++ sketches(b)).distinct.sorted.take(64)
      val eu = est(merged)
      val ei = math.max(0L, ea + eb - eu)
      val exact = bySource(a).intersect(bySource(b)).size.toLong
      (a, b) -> ((ea, eb, eu, ei, exact))
    }).toMap
    val got = SparkEntry.queries("q175_source_overlap")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))))
      .toMap
    assert(got == exp)
    // sanity on the fixture: estimates exist, exact overlap is nonzero
    // somewhere (shared vocabulary across sources), and the KMV union
    // bound holds everywhere (est_union ≤ est_a + est_b)
    assert(got.values.exists(_._5 > 0L))
    got.foreach { case (p, (ea, eb, eu, ei, _)) =>
      assert(eu <= ea + eb, s"$p union bound")
      assert(ei >= 0L, s"$p inter clamp")
    }
  }
}
