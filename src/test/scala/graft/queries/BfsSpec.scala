package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q153 against an independent local BFS: the co-purchase edge set is
  * small at sf0.001, so a plain Scala queue-BFS from the same source
  * reproduces every ring exactly — size, min and max member, and the
  * unreached remainder. This is the only check that doesn't share the
  * frontier/anti-join formulation with the engine or the oracle. */
class BfsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("distributed BFS rings match a local queue BFS") {
    val edges = Tables.raw(spark, sfDir, "lineitem")
      .filter(col("l_quantity") >= 35)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val li = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { basket =>
      val pks = basket.map(_._2).distinct.sorted
      for (i <- pks.indices; j <- (i + 1) until pks.length)
        yield (pks(i), pks(j))
    }.toSet
    val adj = scala.collection.mutable.Map
      .empty[Long, scala.collection.mutable.Set[Long]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    assert(adj.nonEmpty)
    val src = adj.keys.min
    val dist = scala.collection.mutable.Map(src -> 0)
    var frontier = Set(src)
    for (t <- 1 to 4) {
      frontier = frontier.flatMap(adj(_)).filterNot(dist.contains)
      frontier.foreach(dist(_) = t)
    }
    val expRings = dist.groupBy(_._2).map { case (d, m) =>
      d -> (m.size.toLong, m.keys.min, m.keys.max)
    }
    val expUnreached = (adj.size - dist.size).toLong

    val rows = SparkEntry.queries("q153_bfs_distance")(spark, sfDir)
      .collect().map(r => r.getInt(0) ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("min_node"),
          r.getAs[Long]("max_node"))).toMap
    assert(rows(-1)._1 == expUnreached,
      s"unreached ${rows(-1)._1} != local $expUnreached")
    expRings.foreach { case (d, exp) =>
      assert(rows(d) == exp, s"ring $d: ${rows(d)} != local $exp")
    }
    assert(rows.size == expRings.size + 1, "no extra rings")
    graft.Resources.releaseAll()
  }
}
