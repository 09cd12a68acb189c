package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q178 against an independent plain-Scala/BigInt replay: quantize
  * embeddings with round(x·2^20), integer mean centroids per source
  * (truncating division, matching Spark `div`/DuckDB `//`), then for
  * every source pair the signed squared cosine in ppm via
  * sign(dot)·dot²·10⁶ div (‖a‖²·‖b‖²) — bit-for-bit. BigInt on the
  * replay side means an engine overflow would show up as a mismatch,
  * not be mirrored. */
class CentroidSimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("pairwise signed cos²-ppm matches a BigInt replay") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
      .filter { case (id, _) => docs.contains(id) }

    // quantize exactly as both engines do: round half away from zero
    def q20(x: Float): Long =
      new java.math.BigDecimal(x.toDouble * 1048576.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

    val bySource = vecs.groupBy { case (id, _) => docs(id) }
    val cent: Map[String, Array[Long]] = bySource.map { case (s, vs) =>
      val n = vs.length
      val sums = Array.fill(64)(0L)
      vs.foreach { case (_, e) =>
        var i = 0; while (i < 64) { sums(i) += q20(e(i)); i += 1 }
      }
      s -> sums.map(_ / n) // Long / Long truncates toward zero, like div
    }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.lazyZip(b).map(_ * _).sum

    val got = SparkEntry.queries("q178_centroid_similarity")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val sources = cent.keys.toSeq.sorted
    val expectedPairs = for {
      i <- sources.indices; j <- (i + 1) until sources.length
    } yield (sources(i), sources(j))
    assert(got.keySet == expectedPairs.toSet)
    expectedPairs.foreach { case (a, b) =>
      val (ca, cb) = (cent(a), cent(b))
      val d = dot(ca, cb)
      val (na, nb) = (dot(ca, ca), dot(cb, cb))
      val den = (BigInt(na) * BigInt(nb)).max(BigInt(1))
      val cos2 = (if (d < 0) -1 else 1) *
        (BigInt(d).abs * BigInt(d).abs * 1000000 / den).toLong
      assert(got((a, b)) == ((d, na, nb, cos2)),
        s"pair ($a,$b): got ${got((a, b))}, want ($d,$na,$nb,$cos2)")
    }
    // sanity: the fixture's random-ish embeddings give near-colinear
    // MEANS (law of large numbers pulls every centroid toward the same
    // grand mean), so cos² should be high — assert the readout is
    // non-degenerate rather than a constant
    assert(got.values.map(_._4).toSet.size > 1,
      "cos² must vary across pairs")
  }
}
