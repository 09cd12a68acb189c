package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check of the THEOREM q166's two-pass recipe relies on
  * (MisraGriesAgg): for ANY stream and ANY merge tree over its
  * partitions,
  *   (a) the summary never exceeds K−1 counters,
  *   (b) every kept counter undercounts its item's true frequency by at
  *       most N/K (so estimates never overcount), and
  *   (c) every item with true frequency > N/K is PRESENT (superset —
  *       the property that makes candidate-recount EXACT).
  * MisraGriesAggSpec pins these on two crafted streams; this spec pins
  * them on thousands of random skew patterns × random partition splits
  * × random (left-fold vs balanced) merge shapes, where counter-tie
  * eviction and the subtract-the-Kth-largest merge rule are easiest to
  * get wrong. */
class MisraGriesPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  private def mg(xs: Seq[Long]): Map[Long, Long] =
    xs.foldLeft(Map.empty[Long, Long])(MisraGriesAgg.reduce)

  // streams mixing a few heavy ids into a long tail wider than K−1
  private val streamGen: Gen[Vector[Long]] = for {
    nHeavy <- Gen.choose(0, 4)
    heavy <- Gen.listOfN(nHeavy, for {
      id <- Gen.choose(0L, 9L)
      reps <- Gen.choose(50, 400)
    } yield Vector.fill(reps)(id))
    tailN <- Gen.choose(100, 800)
    tail <- Gen.listOfN(tailN, Gen.choose(1000L, 1400L))
    shuffleSeed <- Gen.choose(0L, Long.MaxValue)
  } yield new scala.util.Random(shuffleSeed)
    .shuffle(heavy.flatten.toVector ++ tail.toVector)

  private def checkSummary(buf: Map[Long, Long], xs: Vector[Long]): Unit = {
    val k = MisraGriesAgg.K
    val n = xs.length.toLong
    val exact = xs.groupBy(identity).map { case (x, o) => x -> o.length.toLong }
    assert(buf.size <= k - 1)
    buf.foreach { case (x, est) =>
      val truth = exact.getOrElse(x, 0L)
      assert(est >= 1 && est <= truth, s"overcount: $x est $est true $truth")
      assert(truth - est <= n / k, s"undercount bound: $x")
    }
    exact.foreach { case (x, c) =>
      if (c * k > n) assert(buf.contains(x), s"heavy $x (count $c/$n) lost")
    }
  }

  test("single-partial summaries satisfy size/undercount/superset") {
    sample(streamGen, 400, 91L).foreach(xs => checkSummary(mg(xs), xs))
  }

  test("arbitrary merge trees preserve the guarantees") {
    val cases = sample(for {
      xs <- streamGen
      nParts <- Gen.choose(2, 9)
      balanced <- Gen.oneOf(true, false)
    } yield (xs, nParts, balanced), 400, 92L)
    cases.foreach { case (xs, nParts, balanced) =>
      val parts = xs.grouped(math.max(1, xs.length / nParts))
        .map(mg).toVector
      val merged =
        if (balanced) {
          def tree(v: Vector[Map[Long, Long]]): Map[Long, Long] =
            if (v.length == 1) v.head
            else {
              val (a, b) = v.splitAt(v.length / 2)
              MisraGriesAgg.merge(tree(a), tree(b))
            }
          tree(parts)
        } else parts.reduceLeft(MisraGriesAgg.merge)
      checkSummary(merged, xs)
    }
  }
}
