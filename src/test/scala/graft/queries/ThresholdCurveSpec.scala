package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q170's two CC arms must be indistinguishable from the outside: the
  * driver union-find path (pair count under the gate — what fixtures
  * exercise) and the distributed fixpoint (the 100 TB shape) are forced
  * in turn via the `graft.q170.driverCcCap` test seam and their full
  * 3-row outputs compared byte-for-byte. Protects the adaptive gate
  * from silently diverging semantics — the component-min labelling,
  * the n >= 2 cluster filter, and the doc counts all have to agree. */
class ThresholdCurveSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def runCurve(): Seq[String] =
    SparkEntry.queries("q170_threshold_curve")(spark, sfDir)
      .collect().map(_.toString).toSeq

  test("driver union-find and distributed CC arms agree row-for-row") {
    val key = "graft.q170.driverCcCap"
    val old = System.getProperty(key)
    try {
      System.setProperty(key, "-1") // gate never passes: distributed arm
      val distributed = runCurve()
      System.setProperty(key, Long.MaxValue.toString) // always driver arm
      val driver = runCurve()
      assert(distributed.nonEmpty)
      assert(driver == distributed)
    } finally {
      if (old == null) System.clearProperty(key)
      else System.setProperty(key, old)
    }
  }

  test("curve is monotone: tighter thresholds keep fewer pairs/docs") {
    val rows = SparkEntry.queries("q170_threshold_curve")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(50L, 95L, 98L))
    val pairs = rows.map(_.getLong(1))
    val docs = rows.map(_.getLong(3))
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b })
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b })
  }
}
