package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r14 superstep shuffle contract: when a per-round join keys
  * on the persisted edge artifact's cached partitioning (compactPersist
  * on the join key) and the loop conf matches the artifact's width
  * (withSuperstepConf(n = artifact partitions)), the PERSISTED side is
  * read in place — only the frontier-/score-sized frame shuffles. This
  * is the difference between rounds × |E| and rounds × |frontier| of
  * shuffle traffic at 100 TB, and it is exactly the property a plain
  * union of two orientations silently broke (no output partitioning →
  * the full 2|E| list re-shuffled every round) — so it gets a spec, not
  * a comment. */
class SuperstepShuffleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def shufflesAboveCache(
      df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    val plan = df.queryExecution.executedPlan
    var shuffles = 0
    var cacheScans = 0
    plan.foreach {
      case _: ShuffleExchangeLike     => shuffles += 1
      case _: InMemoryTableScanExec   => cacheScans += 1
      case _                          => ()
    }
    (shuffles, cacheScans)
  }

  test("a src-keyed join against the compactPersist artifact shuffles " +
      "ONLY the frontier side") {
    import spark.implicits._
    val edges = Tuning.compactPersist(
      spark.range(2000).select((col("id") % 500).as("src"),
        (col("id") % 37).as("dst"))
        .repartition(col("src")),
      Seq(col("src")))
    val n = edges.rdd.getNumPartitions
    val frontier = Seq(1L, 2L, 3L).toDF("src")
    try {
      Tuning.withSuperstepConf(spark, n) {
        val joined = frontier.join(edges, Seq("src"))
          .groupBy(col("dst")).agg(count(lit(1)).as("c"))
        val (shuffles, cacheScans) = shufflesAboveCache(joined)
        assert(cacheScans >= 1, "edge side must come from the cache")
        // exactly: frontier → src exchange, aggregate → dst exchange.
        // A third shuffle means the persisted side moved.
        assert(shuffles <= 2,
          s"persisted edge side re-shuffled: $shuffles exchanges in\n" +
            joined.queryExecution.executedPlan.toString)
        assert(joined.collect().nonEmpty)
      }
    } finally edges.unpersist()
  }

  test("a plain union of two orientations loses the partitioning " +
      "(the failure mode biEdges exists to prevent)") {
    import spark.implicits._
    val e = Tuning.compactPersist(
      spark.range(2000).select((col("id") % 500).as("x"),
        (col("id") % 37).as("y"))
        .repartition(col("x")),
      Seq(col("x")))
    val n = e.rdd.getNumPartitions
    val both = e.select(col("x").as("src"), col("y").as("dst"))
      .union(e.select(col("y").as("src"), col("x").as("dst")))
    val frontier = Seq(1L, 2L, 3L).toDF("src")
    try {
      Tuning.withSuperstepConf(spark, n) {
        val joined = frontier.join(both, Seq("src"))
          .groupBy(col("dst")).agg(count(lit(1)).as("c"))
        val (shuffles, _) = shufflesAboveCache(joined)
        // union has no single output partitioning → the edge side must
        // shuffle too: MORE exchanges than the artifact path above.
        // (If Spark ever learns to co-partition a union, this test
        // tells us the biEdges copy can be retired.)
        assert(shuffles >= 3,
          "union-of-orientations unexpectedly kept a reusable " +
            "partitioning — biEdges may be retirable:\n" +
            joined.queryExecution.executedPlan.toString)
        assert(joined.collect().nonEmpty)
      }
    } finally e.unpersist()
  }
}
