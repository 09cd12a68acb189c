package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** IVF (inverted-file) approximate nearest neighbor index: k-means
  * centroids partition the corpus into cells; a query scans only the
  * `nProbe` cells whose centroids are nearest.
  *
  * This is the trained-centroid upgrade of q41 (which probes the fixture's
  * provided `label` as its cell). Scan cost per probe drops from O(corpus)
  * to O(corpus × nProbe / nCells); recall is the dial.
  *
  * The build (an iterative, driver-coordinated k-means job) and the probe
  * are SEPARATE lifecycles: at 100 TB the index is built once as an
  * offline batch job ([[ensure]]/[[persist]] — corpus written
  * `partitionBy("cell")` plus a tiny centroid table) and every query
  * probes the prebuilt files ([[searchPrebuilt]]), where the probe's cell
  * set is pushed as a static partition filter so the scan touches only
  * nProbe cell directories. Training inside the per-query path (the
  * round-1 shape) is exactly what this module exists to avoid.
  *
  * Scoring uses the engine's codegen'd expressions (dot_product/vec_norm)
  * — identical kernels to the exact path, so IVF(nProbe = nCells) equals
  * brute force exactly (spec-pinned).
  */
object IvfIndex {

  /** Corpus (vec_id, embedding) → (vec_id, embedding, cell) plus the
    * centroid table (cell, centroid). Deterministic under a fixed seed. */
  def build(embeddings: DataFrame, nCells: Int, seed: Long = 42L)
      : (DataFrame, DataFrame) = {
    val spark = embeddings.sparkSession
    val withVec = embeddings.withColumn("features",
      array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(nCells).setSeed(seed)
      .setFeaturesCol("features").setPredictionCol("cell")
      .fit(withVec)
    val assigned = model.transform(withVec).drop("features")
    val centroids = {
      import spark.implicits._
      model.clusterCenters.zipWithIndex.toSeq
        .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
        .toDF("cell", "centroid")
    }
    (assigned, centroids)
  }

  /** Write the index to `dir`: the assigned corpus partitioned BY cell
    * (probe-time partition pruning reads only the probed cells' files)
    * and the centroid table (nCells rows — always broadcastable). */
  def persist(assigned: DataFrame, centroids: DataFrame, dir: String): Unit = {
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/corpus")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Read a persisted index back. `cell` comes back as a partition column
    * — filters on it prune at file-listing time. */
  def load(spark: SparkSession, dir: String): (DataFrame, DataFrame) = (
    spark.read.parquet(s"$dir/corpus"),
    spark.read.parquet(s"$dir/centroids"))

  private def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/corpus/_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Build-or-load: the offline-job entry point. Builds + persists on
    * first call for a given `dir`, loads thereafter — callers' query
    * paths never retrain. */
  def ensure(embeddings: DataFrame, nCells: Int, dir: String,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    val spark = embeddings.sparkSession
    if (!exists(spark, dir)) {
      val (assigned, centroids) = build(embeddings, nCells, seed)
      persist(assigned, centroids, dir)
    }
    load(spark, dir)
  }

  /** Top-k cosine neighbors for each probe, scanning only nProbe cells.
    * Cell restriction is expressed as a join — correct anywhere, but
    * pruning relies on the optimizer; prefer [[searchPrebuilt]] over a
    * persisted index. */
  def search(assigned: DataFrame, centroids: DataFrame, probes: DataFrame,
      k: Int, nProbe: Int): DataFrame = {
    val probeCells = nearestCells(centroids, probes, nProbe)
    score(assigned, probeCells, k)
  }

  /** Probe a PREBUILT (persisted, cell-partitioned) index. The distinct
    * probe cells are collected first — a bounded control-plane read of at
    * most probes × nProbe ints — and pushed as a static `cell IN (...)`
    * filter, which the parquet source turns into partition pruning: only
    * the probed cell directories are listed or read. */
  def searchPrebuilt(spark: SparkSession, dir: String, probes: DataFrame,
      k: Int, nProbe: Int): DataFrame = {
    val (assigned, centroids) = load(spark, dir)
    val probeCells = nearestCells(centroids, probes, nProbe)
    val cells = probeCells.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    score(assigned.filter(col("cell").isin(cells: _*)), probeCells, k)
  }

  /** Nearest nProbe centroids per probe (tiny broadcast cross:
    * probes × nCells rows, both sides small by construction). */
  private def nearestCells(centroids: DataFrame, probes: DataFrame,
      nProbe: Int): DataFrame = {
    VectorFunctions.register(probes.sparkSession)
    probes
      .crossJoin(broadcast(centroids))
      .withColumn("c_score", expr("cosine_sim(probe_emb, centroid)"))
      .withColumn("c_rank", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("c_score").desc, col("cell"))))
      .filter(col("c_rank") <= nProbe)
      .select(col("probe_id"), col("probe_emb"), col("cell"))
  }

  /** Scan the (already cell-restricted) corpus against the probe cells. */
  private def score(corpus: DataFrame, probeCells: DataFrame, k: Int)
      : DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    probeCells
      .join(corpus, Seq("cell"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("score", expr("cosine_sim(probe_emb, embedding)"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        col("score"), col("rank"))
  }
}
