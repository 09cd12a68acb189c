package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** q19's sketch-accuracy derivation: accuracy = 5 × largest group,
  * floored at Spark's default and clamped at the memory ceiling, so a
  * driver scale-factor bump can't silently break oracle exactness (GK
  * rank error must be ≪ 1 for the sketch to pin the exact discrete
  * quantile — see the q19 note in Relational.scala). */
class GkAccuracySpec extends AnyFunSuite {

  test("small groups floor at Spark's default accuracy") {
    assert(Relational.gkAccuracy(0L) === Relational.GkAccuracyFloor)
    assert(Relational.gkAccuracy(1L) === Relational.GkAccuracyFloor)
    assert(Relational.gkAccuracy(2000L) === Relational.GkAccuracyFloor)
  }

  test("mid-size groups derive 5× the largest group") {
    assert(Relational.gkAccuracy(200000L) === 1000000L) // sf0.1 shape
    assert(Relational.gkAccuracy(20000L) === 100000L)   // sf0.01 shape
  }

  test("rank error at the derived accuracy is the exactness margin 0.2") {
    val n = 123456L
    val acc = Relational.gkAccuracy(n)
    assert(math.abs(n.toDouble / acc - 0.2) < 1e-9)
  }

  test("huge groups clamp at the memory ceiling") {
    assert(Relational.gkAccuracy(10000000L) === Relational.GkAccuracyCeiling)
    assert(Relational.gkAccuracy(Long.MaxValue / 8) ===
      Relational.GkAccuracyCeiling)
  }

  test("exact fallback equals the GK path on the fixture and at 10x") {
    // past the ceiling the plan switches to the exact value-distribution
    // quantile; both paths must agree wherever both are exact — proven
    // here on the fixture AND a 10× synthetic replication (each copy
    // keeps the group's value distribution, so the discrete quantile is
    // unchanged — any divergence is a path bug, not data drift)
    val spark = graft.TestSpark.spark
    val sfDir = "/root/testdata/sf0.01"
    import org.apache.spark.sql.functions._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0),
        r.getDouble(1), r.getDouble(2))).toSeq
    val gk = rows(Relational.gkQuantilePlan(spark, sfDir,
      forceExact = Some(false)))
    val ex = rows(Relational.gkQuantilePlan(spark, sfDir,
      forceExact = Some(true)))
    assert(gk.nonEmpty && gk == ex, s"gk=$gk exact=$ex")
    val li10 = graft.Tables.lineitem(spark, sfDir)
      .crossJoin(broadcast(spark.range(10).toDF("copy")))
      .drop("copy")
    val gk10 = rows(Relational.gkQuantilePlan(spark, sfDir,
      forceExact = Some(false), liOverride = Some(li10)))
    val ex10 = rows(Relational.gkQuantilePlan(spark, sfDir,
      forceExact = Some(true), liOverride = Some(li10)))
    assert(gk10 == ex10, s"10x: gk=$gk10 exact=$ex10")
    assert(ex10 == ex, "10× replication must not move a discrete quantile")
  }
}
