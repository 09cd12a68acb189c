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
}
