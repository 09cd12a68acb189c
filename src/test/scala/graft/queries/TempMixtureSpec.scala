package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q173's integer-sqrt kernel against BigInt ground truth on the values
  * where a double-seeded sqrt goes wrong (perfect squares ±1, the 2^53
  * representability cliff, Long.MaxValue), plus a fixture replay of the
  * whole temperature solve. */
class TempMixtureSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def isqrt(n: Long): Long =
    if (n <= 0) 0L
    else BigInt(n).underlying.sqrt.longValueExact

  test("isqrt expression is exact on adversarial values") {
    import spark.implicits._
    val ks = Seq(1L, 2L, 3L, 4L, 5L, 1000L, 94906265L /* ≈ √(2^53) */,
      3037000499L /* isqrt(Long.Max) */)
    val vals = (Seq(0L, 1L, 2L, 3L, 4L, 5L, 8L, 9L, 15L, 16L, 24L, 25L,
      (1L << 52) - 1, 1L << 52, (1L << 53) - 1, 1L << 53, (1L << 53) + 1,
      Long.MaxValue, Long.MaxValue - 1) ++
      ks.flatMap(k => Seq(k * k - 1, k * k, k * k + 1).filter(_ >= 0)))
      .distinct
    val got = vals.toDF("tokens")
      .withColumn("s0", greatest(
        expr("cast(sqrt(cast(tokens as double)) as long)"), lit(1L)))
      .withColumn("w", expr(Mixing.isqrtExpr))
      .select(col("tokens"), col("w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach { v =>
      assert(got(v) == isqrt(v), s"isqrt($v): got ${got(v)}")
    }
  }

  test("fixture replay: weights, shares, and boost are the exact solve") {
    val perSource = Tables.documents(spark, sfDir)
      .select(col("source"),
        expr("size(filter(split(text, ' '), t -> t <> ''))")
          .cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("tokens"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = perSource.values.map(BigInt(_)).sum
    val ws = perSource.map { case (s, t) => s -> isqrt(t) }
    val wsum = ws.values.map(BigInt(_)).sum
    def asLong(a: Any): Long = a match {
      case l: java.lang.Long => l.longValue
      case d: java.math.BigDecimal => d.longValueExact
      case o => fail(s"unexpected ppm type: $o (${o.getClass})")
    }
    val got = SparkEntry.queries("q173_temperature_mixture")(spark, sfDir)
      .collect()
    assert(got.length == perSource.size)
    got.foreach { r =>
      val (src, tokens) = (r.getString(0), r.getLong(1))
      assert(tokens == perSource(src))
      val w = r.getLong(2)
      assert(w == ws(src), s"$src isqrt")
      val rawPpm = (BigInt(tokens) * 1000000 / tot).toLong
      val tempPpm = (BigInt(w) * 1000000 / wsum).toLong
      assert(asLong(r.get(3)) == rawPpm, s"$src raw_ppm")
      assert(asLong(r.get(4)) == tempPpm, s"$src temp_ppm")
      val boost = BigInt(tempPpm) * 1000000 / BigInt(rawPpm).max(1)
      assert(asLong(r.get(5)) == boost.toLong, s"$src boost_ppm")
    }
    // temperature must actually flatten: the smallest source is
    // up-weighted (boost > 1e6), the largest down-weighted
    val bySize = got.sortBy(_.getLong(1))
    assert(asLong(bySize.head.get(5)) > 1000000L)
    assert(asLong(bySize.last.get(5)) < 1000000L)
  }
}
