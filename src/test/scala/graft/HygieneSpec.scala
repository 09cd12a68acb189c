package graft

import org.scalatest.funsuite.AnyFunSuite

/** Persisted-frame hygiene: the shared-index caches (LSH candidates) and
  * operator-returned persisted frames (connected-components labels) must
  * all be released by the session-owner cleanup path, leaving ZERO
  * persisted RDDs — the invariant Verify/Bench assert before stop(). */
class HygieneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("release paths leave no persisted RDDs behind") {
    // build the in-memory cached artifacts a run can leave behind
    graft.queries.Dedup.ensureCandidateIndex(spark, sfDir)
    graft.queries.Dedup.ensureShingleIndex(spark, sfDir)
    graft.queries.Graph.ensureCoEdges(spark, sfDir)
    graft.queries.Graph.ensureWalkAdj(spark, sfDir)
    graft.queries.Graph.ensureHitsEdges(spark, sfDir)
    graft.queries.Dedup.ensureClusterLabels(spark, sfDir)
    graft.queries.Dedup.ensureSpanIndex(spark, sfDir)
    graft.queries.TextAnalysis.ensureBm25(spark, sfDir)
    graft.queries.TextAnalysis.ensureLmScores(spark, sfDir)
    graft.queries.Training.ensureProbeModel(spark, sfDir)
    val nodes = spark.range(6).toDF("id")
    val edges = spark.createDataFrame(Seq((0L, 1L), (1L, 2L), (4L, 5L)))
      .toDF("src", "dst")
    val labels = operators.ConnectedComponents.labels(nodes, edges)
    assert(labels.count() === 6)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "precondition: caches exist before release")

    graft.queries.Dedup.releaseCandidateIndex(spark)
    graft.queries.Graph.releaseCoEdges(spark)
    graft.queries.TextAnalysis.releaseBpe(spark)
    Resources.releaseAll()
    // unpersist(blocking=false) unregisters synchronously; block removal
    // is async but getPersistentRDDs reflects unregistration immediately
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leftover: ${spark.sparkContext.getPersistentRDDs.keys}")
  }

  test("release is idempotent and frames stay usable after release") {
    graft.queries.Dedup.ensureCandidateIndex(spark, sfDir)
    graft.queries.Dedup.releaseCandidateIndex(spark)
    graft.queries.Dedup.releaseCandidateIndex(spark)
    Resources.releaseAll()
    Resources.releaseAll()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
    // a post-release query rebuilds the index transparently
    graft.queries.Dedup.ensureCandidateIndex(spark, sfDir)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    graft.queries.Dedup.releaseCandidateIndex(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("cluster-label memo rebuilds after releaseAll (no dead frame)") {
    // the memo points at a Resources-owned localCheckpoint; releaseAll
    // kills the checkpoint AND (via the onReleaseAll hook) clears the
    // memo — a stale entry would serve a lineage-truncated frame that
    // can never be recomputed
    graft.queries.Dedup.ensureClusterLabels(spark, sfDir)
    Resources.releaseAll()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    val n = graft.SparkEntry.queries("q65_dedup_clusters")(spark, sfDir)
      .count()
    assert(n == nDocs, "labels must rebuild transparently after release")
    graft.queries.Dedup.releaseCandidateIndex(spark)
    Resources.releaseAll()
  }

  test("localCheckpoint-based queries release through Resources too") {
    // q109 pins its range partitioning with an eager localCheckpoint and
    // q108 persists the phash frame — both retained via Resources; the
    // checkpoint RDD is only reclaimable through releaseCheckpoint
    // (Dataset.unpersist never hears about RDD-layer persistence)
    val q109 = graft.SparkEntry.queries("q109_equidepth_histogram")
    assert(q109(spark, sfDir).count() == 16)
    val q108 = graft.SparkEntry.queries("q108_media_phash_neardup")
    assert(q108(spark, sfDir).count() >= 0)
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "precondition: checkpoint/persisted frames exist")
    Resources.releaseAll()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leftover: ${spark.sparkContext.getPersistentRDDs.keys}")
  }
}
