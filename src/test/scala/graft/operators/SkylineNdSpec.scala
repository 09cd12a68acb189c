package graft.operators

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The general d-dim skyline operator and its q160 query against full
  * row-level pairwise dominance computed locally — the independence the
  * candidate-bounded NOT-EXISTS oracle doesn't provide by itself — plus
  * operator-level edge cases the fixture can't produce (duplicate
  * vectors, anti-correlated dims, d = 4, adversarial partitioning). */
class SkylineNdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def dominates(a: Seq[Long], b: Seq[Long]): Boolean =
    a.zip(b).forall { case (x, y) => x >= y } && a != b

  private def bruteSkyline(pts: Seq[Seq[Long]]): Set[Seq[Long]] =
    pts.filter(p => !pts.exists(q => dominates(q, p))).toSet

  test("q160 equals naive row-level pairwise dominance") {
    val rows = Tables.raw(spark, sfDir, "orders")
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"),
        expr("cast(unix_date(cast(o_orderdate as date)) as bigint)"),
        expr("cast(substring(o_orderpriority, 1, 1) as bigint)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // maximize price and day, minimize priority → negate r
    val expected = rows.filter { case (_, p, d, r) =>
      !rows.exists { case (_, p2, d2, r2) =>
        dominates(Seq(p2, d2, -r2), Seq(p, d, -r))
      }
    }.toSet
    assert(expected.nonEmpty)
    val got = SparkEntry.queries("q160_skyline_3d")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected,
      s"only-engine=${got -- expected} only-brute=${expected -- got}")
    graft.Resources.releaseAll()
  }

  test("operator handles ties, duplicates, and anti-correlation at d=3") {
    import spark.implicits._
    val pts = Seq(
      Seq(5L, 1L, 1L), Seq(5L, 1L, 1L), // duplicate frontier vector
      Seq(1L, 5L, 1L), Seq(1L, 1L, 5L), // anti-correlated frontier
      Seq(4L, 1L, 1L), // dominated by (5,1,1)
      Seq(1L, 5L, 1L), // duplicate again
      Seq(0L, 0L, 0L), // dominated by everything
      Seq(5L, 1L, 0L)) // dominated by (5,1,1)
    val got = Skyline.skyline(pts.toDF("dims"))
      .as[Seq[Long]].collect().toSet
    assert(got == bruteSkyline(pts))
    assert(got == Set(Seq(5L, 1L, 1L), Seq(1L, 5L, 1L), Seq(1L, 1L, 5L)))
    graft.Resources.releaseAll()
  }

  test("operator is partitioning-invariant and works at d=4") {
    import spark.implicits._
    // deterministic pseudo-random 4-D points: every permutation of the
    // partitioning must give the same frontier (phase 1 is local, phase
    // 2 global — correctness can't depend on who lands where)
    val pts = (1 to 400).map { i =>
      Seq((i * 2654435761L) % 97, (i * 40503L) % 89,
        (i * 69621L) % 83, (i * 48271L) % 79).map(_.toLong)
    }
    val expected = bruteSkyline(pts)
    for (parts <- Seq(1, 3, 32)) {
      val got = Skyline.skyline(
        pts.toDF("dims").repartition(parts))
        .as[Seq[Long]].collect()
      assert(got.toSet == expected, s"parts=$parts")
      assert(got.length == got.distinct.length,
        "tied vectors must ship exactly once from the operator")
    }
    // force the pre-broadcast elimination round (candidate count over
    // the bound → range-repartition on dim 0 + second local BNL): the
    // result must be identical — any partitioning is correct for a
    // local pass, the round only shrinks the broadcast
    val gotElim = Skyline.skyline(
      pts.toDF("dims").repartition(32), broadcastBound = 1L)
      .as[Seq[Long]].collect()
    assert(gotElim.toSet == expected)
    graft.Resources.releaseAll()
  }

  test("true frontier above the broadcast bound takes the bucketed pass") {
    import spark.implicits._
    // perfectly anti-correlated: EVERY point is on the frontier, so no
    // elimination round can shrink the candidate set below the bound —
    // the operator must fall back to the bucketed (non-broadcast)
    // dominance join and still return the exact frontier. Dominated
    // points mixed in verify the fallback filters too.
    val frontier = (0L until 500L).map(i => Seq(i, 499L - i))
    val dominated = (0L until 250L).map(i => Seq(i, 498L - i - (i % 3)))
      .filterNot(p => frontier.contains(p))
    val pts = new scala.util.Random(7).shuffle(frontier ++ dominated)
    val got = Skyline.skyline(
      pts.toDF("dims").repartition(8), broadcastBound = 10L)
      .as[Seq[Long]].collect()
    assert(got.toSet == bruteSkyline(pts))
    assert(got.toSet == frontier.toSet)
    assert(got.length == frontier.length)
    graft.Resources.releaseAll()
  }
}
