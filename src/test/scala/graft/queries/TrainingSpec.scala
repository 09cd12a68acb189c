package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Learning dynamics of the exact-integer GD probe trainer (q136): the
  * oracle pins bit-exactness; this spec pins that the optimizer
  * actually OPTIMIZES — each of the three fixed-point steps must
  * strictly reduce the training loss (w=0 start, lr=1/4 on normalized
  * µ-unit features is well inside the stable region), and the first
  * step must move the bias toward the base rate, not away. */
class TrainingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("integer GD strictly decreases training loss each step") {
    val rows = SparkEntry.queries("q136_gd_probe_train")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 3)
    val losses = rows.map(_.getLong(6))
    assert(losses(0) > losses(1) && losses(1) > losses(2),
      s"loss must strictly decrease, got ${losses.toList}")
    // from w=0 every pred is 0, err = -y, so g0 = -Σy < 0 and the
    // first update must push the bias POSITIVE (toward the base rate)
    assert(rows(0).getLong(1) > 0,
      s"bias after step 1 must be positive, got ${rows(0).getLong(1)}")
  }
}
