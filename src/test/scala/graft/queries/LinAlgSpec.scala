package graft.queries

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** The q141 oracle pins bit-exact replay; this spec pins that the
  * integer power iteration actually ESTIMATES — on matrices with a
  * known dominant axis the iterate must align with it — plus the
  * end-to-end invariants the oracle cannot see (determinism across
  * runs, per-label coverage). */
class LinAlgSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("power iteration finds the dominant axis of a diagonal matrix") {
    // diag(100, 10, 1) in integer units: dominant eigenvector is e0
    val g = Array(
      Array(100L, 0L, 0L),
      Array(0L, 10L, 0L),
      Array(0L, 0L, 1L))
    val (v, lambda) = LinAlg.powerIterate(g, 4)
    assert(math.abs(v(0)) > 100 * math.abs(v(1)),
      s"component 0 must dominate: ${v.toList}")
    assert(math.abs(v(0)) > 100 * math.abs(v(2)))
    // Rayleigh quotient sits at the dominant eigenvalue, minus the
    // systematic downward bias of per-element truncating division
    assert(lambda >= 98L && lambda <= 100L,
      s"lambda must approximate 100, got $lambda")
  }

  test("power iteration aligns with the dominant axis of a dense spd matrix") {
    // A = 1000·u·uᵀ + I with u = (3,4)/5: dominant direction (3,4)
    val g = Array(
      Array(361L, 480L),  // 1000·(9/25)+1, 1000·(12/25)
      Array(480L, 641L))  // 1000·(12/25), 1000·(16/25)+1
    val (v, lambda) = LinAlg.powerIterate(g, 6)
    // v must be proportional to (3,4): cross-product ≈ 0
    val cross = math.abs(v(0) * 4L - v(1) * 3L)
    val scale = math.max(math.abs(v(0)), math.abs(v(1)))
    assert(cross <= scale, s"v=(${v(0)}, ${v(1)}) must align with (3,4)")
    assert(lambda >= 990L && lambda <= 1010L,
      s"lambda must approximate 1001, got $lambda")
  }

  test("integer iterate aligns with a double-precision reference on real data") {
    // build the exact centered covariance of the sf0.001 embeddings in
    // doubles, run a LONG double-precision power iteration (the ground
    // truth), and require the 4-step integer iterate to align: the
    // truncation machinery must not change WHICH axis is found
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dim = vecs.head.length
    val n = vecs.length
    val mean = Array.tabulate(dim)(j => vecs.map(_(j)).sum / n)
    val cov = Array.tabulate(dim, dim)((i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum)
    var ref = Array.fill(dim)(1.0)
    for (_ <- 1 to 200) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => cov(i)(j) * ref(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      ref = w.map(_ / norm)
    }
    // integer path: same quantized/truncated covariance q141 builds
    val q = vecs.map(_.map(x => math.round(x * 1048576.0)))
    val m = Array.tabulate(dim)(j => q.map(_(j)).sum / n)
    val g = Array.tabulate(dim, dim)((i, j) =>
      (q.map(v => v(i) * v(j)).sum - n.toLong * m(i) * m(j)) / 1073741824L)
    val (v, _) = LinAlg.powerIterate(g, LinAlg.Iters)
    val dot = (0 until dim).map(i => v(i) * ref(i)).sum
    val vn = math.sqrt(v.map(x => x.toDouble * x).sum)
    val cos = math.abs(dot / vn)
    assert(cos > 0.95, s"integer iterate must align with the true axis " +
      s"(|cos| = $cos)")
  }

  test("q141 is deterministic and covers every labelled vector") {
    val run1 = SparkEntry.queries("q141_pca_power")(spark, sfDir).collect()
    val run2 = SparkEntry.queries("q141_pca_power")(spark, sfDir).collect()
    assert(run1.toSeq == run2.toSeq, "re-run must be bit-identical")
    assert(run1.nonEmpty)
    val total = run1.map(_.getLong(1)).sum
    val n = graft.Tables.embeddings(spark, sfDir).count()
    assert(total == n, s"per-label counts must cover all $n vectors")
    // variance along any axis is positive — so is its Rayleigh quotient
    val lambda = run1.head.getLong(5)
    assert(lambda > 0L, s"lambda must be positive, got $lambda")
    // projections bound the mean
    run1.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(4),
        s"min <= mean <= max violated: $r")
    }
  }
}
