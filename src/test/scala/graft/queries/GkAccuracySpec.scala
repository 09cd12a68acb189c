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
}
