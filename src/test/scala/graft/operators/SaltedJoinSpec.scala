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
}
