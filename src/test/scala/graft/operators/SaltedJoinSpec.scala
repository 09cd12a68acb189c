package graft.operators

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("salted join result equals plain join (skewed fact side)") {
    import spark.implicits._
    // fabricate skew: 90% of fact rows on one key
    val fact = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 50 else 7L, s"row$i")).toDF("k", "v")
    val dim = (0L to 49L).map(k => (k, s"dim$k")).toDF("k", "d")

    val plain = fact.join(dim, Seq("k"), "inner")
      .select("k", "v", "d").collect().map(_.toSeq).sortBy(_.toString)
    val salted = SaltedJoin.inner(fact, dim, "k", salts = 8)
      .select("k", "v", "d").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)
    assert(plain.nonEmpty)
  }

  test("salted join on fixture tables matches plain join counts") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_partkey").as("k"), col("l_quantity"))
    val p = Tables.part(spark, sfDir)
      .select(col("p_partkey").as("k"), col("p_brand"))
    val expected = li.join(p, Seq("k")).count()
    assert(SaltedJoin.inner(li, p, "k", salts = 4).count() == expected)
  }

  test("salt is deterministic across repeated evaluation") {
    import spark.implicits._
    val fact = (1 to 500).map(i => (7L, s"row$i")).toDF("k", "v")
    val salted = fact.withColumn("__salt",
      pmod(hash(col("k"), col("v")), lit(8)))
    val a = salted.collect().map(_.toSeq).sortBy(_.toString).toSeq
    val b = salted.collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(a == b)
    // hot key actually spreads over multiple salts
    assert(salted.select("__salt").distinct().count() > 1)
  }

  test("explicit saltFrom row-id spreads byte-identical duplicate rows") {
    import spark.implicits._
    // all fact rows identical: content-hash salting would collapse them
    // onto one reducer; a caller-supplied unique row-id spreads them
    val fact = (1 to 400).map(i => (7L, "same", i.toLong)).toDF("k", "v", "rid")
    val dim = Seq((7L, "d7")).toDF("k", "d")
    val joined = SaltedJoin.inner(fact, dim, "k", salts = 8, Seq(col("rid")))
    assert(joined.count() == 400)
    val spread = fact.withColumn("__salt", pmod(hash(col("rid")), lit(8)))
      .select("__salt").distinct().count()
    assert(spread > 1)
  }
}
