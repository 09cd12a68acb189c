package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q193 against an independent brute-force local replay: thumbnail
  * bytes, the planted duplicate/re-encode structure, BOTH hashes and
  * the full all-pairs flag matrix are recomputed here in plain Scala
  * (no Spark expressions, no banding — every pair is examined), then
  * the per-class agreement aggregate is compared exactly with the
  * engine's output. This is the check that the LSH banding misses
  * nothing: the pigeonhole argument (Hamming ≤ 3 over 4 bands of 15
  * bits leaves one band intact) says the banded candidate set covers
  * every flagged pair — the brute force verifies it on real data. */
class MediaCrossHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def thumbBytes(text: String): Array[Int] = {
    val h = md5hex(text) + md5hex(text + "r1") + md5hex(text + "r2") +
      md5hex(text + "r3")
    Array.tabulate(60)(j => Integer.parseInt(h.substring(2 * j, 2 * j + 2), 16))
  }

  private def aHash(b: Array[Int]): Long = {
    val mean = b.sum / 60 // truncating div, both engines' convention
    (0 until 60).foldLeft(0L)((acc, j) =>
      if (b(j) > mean) acc + (1L << j) else acc)
  }

  private def dHash(b: Array[Int]): Long =
    (0 until 59).foldLeft(0L)((acc, j) =>
      if (b(j + 1) > b(j)) acc + (1L << j) else acc)

  test("per-class agreement matrix matches an all-pairs local replay") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), thumbBytes(r.getString(1))))
    assert(docs.nonEmpty)

    // planted structure, exactly the query's: exact dup for ≡7 (mod 50),
    // 3-byte +96 re-encode for ≡19 (mod 50)
    val media = docs ++
      docs.filter(_._1 % 50 == 7).map { case (id, b) => (id + 1000000L, b) } ++
      docs.filter(_._1 % 50 == 19).map { case (id, b) =>
        // summed delta when positions coincide — count multiplicity
        val deltas = Seq((id % 60).toInt, ((id * 7) % 60).toInt,
          ((id * 13) % 60).toInt)
        val b2 = b.clone()
        deltas.foreach(j => b2(j) = b2(j) + 96)
        (id + 2000000L, b2.map(_ % 256))
      }
    assert(media.length > docs.length, "planted rows must exist")

    val hashed = media.map { case (id, b) => (id, aHash(b), dHash(b)) }
      .sortBy(_._1)
    // brute force: every ordered pair, no banding
    val agg = scala.collection.mutable.Map
      .empty[String, (Long, Long, Long, Long, Long, Long)]
    for (i <- hashed.indices; k <- (i + 1) until hashed.length) {
      val (id1, a1, d1) = hashed(i)
      val (id2, a2, d2) = hashed(k)
      val hamA = java.lang.Long.bitCount(a1 ^ a2)
      val hamD = java.lang.Long.bitCount(d1 ^ d2)
      if (hamA <= 3 || hamD <= 3) {
        val cls = if (id2 >= 2000000L) "reencoded"
          else if (id2 >= 1000000L) "exact_dup" else "organic"
        val fa = if (hamA <= 3) 1L else 0L
        val fd = if (hamD <= 3) 1L else 0L
        val (u, bo, ao, dOnly, sa, sd) =
          agg.getOrElse(cls, (0L, 0L, 0L, 0L, 0L, 0L))
        agg(cls) = (u + 1, bo + fa * fd, ao + fa * (1 - fd),
          dOnly + (1 - fa) * fd, sa + fa * hamA, sd + fd * hamD)
      }
    }

    val out = SparkEntry.queries("q193_media_cross_hash")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(out === agg.toMap,
      s"engine=$out replay=${agg.toMap}")
    // the exact-dup class must exist and agree perfectly (hamming 0)
    val ex = out("exact_dup")
    assert(ex._2 === ex._1 && ex._3 === 0L && ex._4 === 0L &&
      ex._5 === 0L && ex._6 === 0L,
      "exact duplicates must be flagged by both hashes at hamming 0")
    graft.Resources.releaseAll()
  }
}
