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
  * to O(corpus × nProbe / nCells); recall is the dial. At 100 TB the cell
  * assignment runs once as a batch job, the index is written partitioned
  * BY cell (`partitionBy("cell")`), and probe-time partition pruning makes
  * each query touch only its cells' files.
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

  /** Top-k cosine neighbors for each probe, scanning only nProbe cells. */
  def search(assigned: DataFrame, centroids: DataFrame, probes: DataFrame,
      k: Int, nProbe: Int): DataFrame = {
    val spark = assigned.sparkSession
    VectorFunctions.register(spark)
    // 1. nearest nProbe centroids per probe (tiny broadcast cross)
    val probeCells = probes
      .crossJoin(broadcast(centroids))
      .withColumn("c_score", expr("cosine_sim(probe_emb, centroid)"))
      .withColumn("c_rank", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("c_score").desc, col("cell"))))
      .filter(col("c_rank") <= nProbe)
      .select(col("probe_id"), col("probe_emb"), col("cell"))
    // 2. scan only those cells (join on cell prunes the corpus)
    probeCells
      .join(assigned, Seq("cell"))
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
