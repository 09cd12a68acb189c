package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.labels(
      nodes.toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph collapses to one component labeled by its min id") {
    // 1-2-3-4-5 chain: diameter 4 forces multiple propagation rounds
    val got = run(1L to 5L, Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("separate components and isolated nodes keep distinct labels") {
    val got = run(1L to 7L, Seq((2L, 6L), (6L, 4L), (3L, 7L)))
    assert(got == Map(
      1L -> 1L,            // isolated
      2L -> 2L, 4L -> 2L, 6L -> 2L,
      3L -> 3L, 7L -> 3L,
      5L -> 5L))           // isolated
  }

  test("edge direction does not matter (symmetrized)") {
    val a = run(1L to 3L, Seq((3L, 1L), (2L, 3L)))
    assert(a == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  private def runStar(nodes: Seq[Long],
      edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    import spark.implicits._
    val (df, rounds) = ConnectedComponents.labelsStar(
      nodes.toDF("id"), edges.toDF("src", "dst"))
    (df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("large-star/small-star matches propagation on a random graph") {
    val rnd = new scala.util.Random(42)
    val nodes = 0L until 120L
    val edges = Seq.fill(90)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val expected = run(nodes, edges)
    val (got, _) = runStar(nodes, edges)
    assert(got == expected)
  }

  test("star contraction collapses a 200-node chain in O(log n) rounds") {
    // diameter 199: min-label propagation would need 199 join rounds;
    // star contraction must finish in ~log2(200) alternations
    val nodes = 0L until 200L
    val edges = (0L until 199L).map(i => (i, i + 1))
    val (got, rounds) = runStar(nodes, edges)
    assert(got.values.forall(_ == 0L), "single component labeled 0")
    assert(got.size == 200)
    assert(rounds <= 12, s"expected logarithmic convergence, used $rounds")
  }

  test("star variant: isolated nodes and empty edge sets label themselves") {
    val (got, rounds) = runStar(Seq(5L, 9L), Seq.empty)
    assert(got == Map(5L -> 5L, 9L -> 9L))
    assert(rounds == 0)
  }
}
