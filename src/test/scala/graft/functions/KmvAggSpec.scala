package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Structural sketch properties q105's oracle relies on: the distributed
  * sketch equals the single-partition one (mergeability), the sketch IS
  * the k smallest distinct hashes (what DuckDB's ordered-list-prefix
  * reconstruction assumes), and the estimate lands near the truth. */
class KmvAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new Random(11)

  test("sketch is partition-invariant and equals the k smallest distinct") {
    // duplicates on purpose: the sketch must dedup internally
    val hs = Seq.fill(20000)(rnd.nextLong(1L << 48))
    val dup = hs ++ hs.take(5000)
    val kmv = udaf(KmvAgg)
    val one = dup.toDF("h").repartition(1)
      .agg(kmv($"h")).as[Seq[Long]].head()
    val many = dup.toDF("h").repartition(13)
      .agg(kmv($"h")).as[Seq[Long]].head()
    assert(one == many, "partition count must not change the sketch")

    val expected = dup.distinct.sorted.take(KmvAgg.K)
    assert(one == expected, "sketch must be the k smallest distinct hashes")
  }

  test("estimate is within the 3-sigma KMV error envelope") {
    val n = 50000
    val hs = (0 until n).map(_ => rnd.nextLong(1L << 48)).distinct
    val kmv = udaf(KmvAgg)
    val sk = hs.toDF("h").agg(kmv($"h")).as[Seq[Long]].head()
    assert(sk.length == KmvAgg.K)
    val est = (KmvAgg.K - 1).toLong * KmvAgg.Domain / sk.last
    val sigma = 3.0 / math.sqrt(KmvAgg.K - 2.0)
    assert(math.abs(est.toDouble / hs.size - 1.0) < sigma,
      s"est $est vs exact ${hs.size} outside ±${sigma}")
  }

  test("small sets come back exact") {
    val hs = Seq(42L, 7L, 7L, 99L, 42L)
    val kmv = udaf(KmvAgg)
    val sk = hs.toDF("h").agg(kmv($"h")).as[Seq[Long]].head()
    assert(sk == Seq(7L, 42L, 99L))
  }
}
