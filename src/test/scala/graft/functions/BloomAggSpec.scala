package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Structural Bloom properties q82's oracle relies on: partition-invariant
  * merge, zero false negatives, and a sane false-positive rate at the
  * designed load factor. */
class BloomAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new Random(11)

  test("filter is partition-invariant and has no false negatives") {
    val keys = Seq.fill(20000)(rnd.nextLong().abs % 1000000L).distinct
    val bloom = udaf(BloomAgg)
    val one = keys.toDF("k").repartition(1)
      .agg(bloom($"k")).as[Seq[Long]].head()
    val many = keys.toDF("k").repartition(17)
      .agg(bloom($"k")).as[Seq[Long]].head()
    assert(one == many, "partition count must not change the filter")
    keys.foreach { k =>
      assert(BloomAgg.mightContain(one, k), s"false negative on $k")
    }
  }

  test("false-positive rate stays near the double-hashing estimate") {
    val keys = (0L until 30000L).toSeq
    val bloom = udaf(BloomAgg)
    val bf = keys.toDF("k").agg(bloom($"k")).as[Seq[Long]].head()
    val probes = (1000000L until 1020000L).toSeq // disjoint from keys
    val fp = probes.count(BloomAgg.mightContain(bf, _))
    // theoretical (1 - e^(-kn/m))^k ≈ 1.6e-4 at n=30k, m=2^20, k=4;
    // double hashing inflates it slightly — generous 20× headroom
    assert(fp <= probes.size * 0.003, s"$fp false positives in ${probes.size}")
  }
}
