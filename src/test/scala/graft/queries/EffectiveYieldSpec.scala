package graft.queries

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q195 against local replays of both keeper rules plus cross-checks
  * with the operators it composes: total exact keepers must equal q30's
  * row count, total near keepers must equal the distinct-cluster count
  * of the shared q65 label artifact, and the per-source token ladders
  * (raw ≥ exact-surviving ≥ near-surviving on this fixture, where
  * identical texts always share a cluster) plus the ppm arithmetic
  * replay exactly. */
class EffectiveYieldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("per-source yield replays keeper rules and composes with q30/q65") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val nTok: Map[Long, Long] = docs.map { case (id, _, t) =>
      id -> t.split(" ").count(_.nonEmpty).toLong
    }.toMap
    // exact keepers: min doc_id per identical text (replayed on raw text
    // — md5 is injective for the comparison's purposes)
    val exactKeepers = docs.groupBy(_._3).values.map(_.map(_._1).min).toSet
    // near keepers from the shared artifact: label == member id
    val labels = SparkEntry.queries("q65_dedup_clusters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nearKeepers = labels.filter { case (id, c) => id == c }.map(_._1).toSet
    assert(nearKeepers == labels.map(_._2).toSet,
      "cluster labels must BE their minimum member ids")

    val bySource = docs.groupBy(_._2)
    val expected = bySource.map { case (src, ds) =>
      val ids = ds.map(_._1)
      val raw = ids.map(nTok).sum
      val te = ids.filter(exactKeepers).map(nTok).sum
      val tn = ids.filter(nearKeepers).map(nTok).sum
      src -> (ids.length.toLong, raw,
        ids.count(exactKeepers).toLong, te,
        ids.count(nearKeepers).toLong, tn,
        tn * 1000000L / math.max(raw, 1L))
    }

    val got = SparkEntry.queries("q195_effective_yield")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(got == expected, s"per-source yield diverged:\n$got\n$expected")

    // composition cross-checks
    val q30n = SparkEntry.queries("q30_dedup_exact")(spark, sfDir).count()
    assert(got.values.map(_._3).sum == q30n,
      "total exact keepers must equal q30's distinct-text count")
    assert(got.values.map(_._5).sum == labels.map(_._2).distinct.length,
      "total near keepers must equal the artifact's cluster count")
    // fixture ladder: identical texts share a cluster, so every near
    // keeper is an exact keeper and the masses nest
    got.foreach { case (src, (n, raw, de, te, dn, tn, _)) =>
      assert(dn <= de && de <= n, s"$src: keeper counts must nest")
      assert(tn <= te && te <= raw, s"$src: token masses must nest")
    }
  }
}
