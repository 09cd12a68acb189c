package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TriangleCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    TriangleCount.run(edges.toDF("x", "y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("one triangle plus a pendant edge") {
    // 1-2-3 closed, 4 hangs off 1: exactly one triangle, node 4 absent
    val out = counts(Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L)))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("K4 has four triangles, three per node") {
    // every node of K4 sits in C(3,2) = 3 of the 4 triangles
    val k4 = for {
      a <- 1L to 4L; b <- (a + 1) to 4L
    } yield (a, b)
    val out = counts(k4)
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    graft.Resources.releaseAll()
  }

  test("a 4-cycle has no triangles") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))).isEmpty)
  }

  test("counts are invariant under node relabeling and partitioning") {
    import spark.implicits._
    // two triangles sharing edge (2,3): nodes 2,3 → 2 triangles each.
    // Relabeling flips every degree tie, exercising the (deg, id)
    // total-order orientation; triangle structure must not change.
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val base = counts(g)
    assert(base == Map(1L -> 1L, 4L -> 1L, 2L -> 2L, 3L -> 2L))
    val relabel: Long => Long = n => 100L - n
    val mapped = g.map { case (a, b) =>
      (relabel(a) min relabel(b), relabel(a) max relabel(b))
    }
    val viaRelabel =
      counts(mapped).map { case (n, c) => (100L - n) -> c }
    assert(viaRelabel == base)
    val repart = TriangleCount.run(g.toDF("x", "y").repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(repart == base)
    graft.Resources.releaseAll()
  }
}
