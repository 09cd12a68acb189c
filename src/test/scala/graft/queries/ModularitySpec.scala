package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** q151 structural invariants — the oracle pins bit-exactness; this
  * pins that the numbers actually form a modularity decomposition:
  * degree mass must sum to exactly 2m (every edge contributes two
  * endpoint-degrees), intra-cluster edges can never exceed m, and each
  * cluster's contribution respects the Q_c ≤ L_c/m bound (the penalty
  * term only subtracts). */
class ModularitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("modularity decomposition invariants hold") {
    val rows = SparkEntry.queries("q151_modularity")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty, "fixture must yield a non-empty near-dup graph")
    val intra = rows.map(_.getAs[Long]("intra_edges")).sum
    val degSum = rows.map(_.getAs[Long]("deg_sum")).sum
    assert(degSum % 2 == 0, "degree mass must be even")
    val m = degSum / 2
    assert(intra <= m, s"intra-cluster edges $intra must be <= m $m")
    rows.foreach { r =>
      val (lc, dc, q) = (r.getAs[Long]("intra_edges"),
        r.getAs[Long]("deg_sum"),
        r.getAs[Long]("contribution_micro"))
      assert(r.getAs[Long]("n_nodes") > 0)
      assert(lc >= 0 && dc > 0)
      // Q_c ≤ L_c/m (penalty only subtracts) and Q_c > −1 in µ-units
      assert(q <= 1000000L * lc / m + 1)
      assert(q > -1000000L)
    }
    // the SIGN of total Q is the eval's verdict on the clustering, not
    // an operator property (measured: −0.28 at sf0.001 — the 8 k-means
    // cells cut across the label-blocked near-dup graph there); only
    // the mathematical range is an invariant
    val total = rows.map(_.getAs[Long]("contribution_micro")).sum
    assert(total > -1000000L && total < 1000000L,
      s"total modularity out of (-1, 1): $total")
    graft.Resources.releaseAll()
  }
}
