package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q171 against an independent local replay (naive per-node triangle
  * counting over adjacency sets — the O(Σ deg²) shape the distributed
  * operator exists to avoid, correct at fixture size), plus a hand graph
  * with known coefficients. */
class ClusteringCoeffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("hand graph: triangle with a pendant edge") {
    import spark.implicits._
    // {1,2,3} is a triangle; 4 hangs off 3. deg(3) = 3 so its cc is
    // 1 triangle / C(3,2) = 1/3; the pendant (deg 1) is out of domain.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("x", "y")
    val deg = edges.select(col("x").as("node"))
      .union(edges.select(col("y").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val got = deg.filter(col("deg") >= 2)
      .join(graft.operators.TriangleCount.run(edges), Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"),
        expr("(coalesce(tri, 0L) * 2000000L) div (deg * (deg - 1L))")
          .as("cc_ppm"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1000000L)),
      2L -> ((2L, 1L, 1000000L)),
      3L -> ((3L, 1L, 333333L))))
  }

  test("fixture replay matches a naive local triangle count") {
    val edges = Tables.raw(spark, sfDir, "lineitem")
      .filter(col("l_quantity") >= 35)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values
      .flatMap { grp =>
        val ps = grp.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length)
          yield (ps(i), ps(j))
      }.toSet
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (x, y) =>
      adj(x) = adj(x) + y; adj(y) = adj(y) + x
    }
    val exp = adj.toMap.collect { case (n, nb) if nb.size >= 2 =>
      val tri = nb.toSeq.combinations(2)
        .count { case Seq(a, b) => adj(a).contains(b) }
        .toLong
      n -> ((nb.size.toLong, tri,
        tri * 2000000L / (nb.size.toLong * (nb.size - 1))))
    }
    val got = SparkEntry.queries("q171_clustering_coefficient")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == exp)
    // non-trivial on the fixture: some node closes a triangle
    assert(got.values.exists(_._3 > 0L))
  }
}
