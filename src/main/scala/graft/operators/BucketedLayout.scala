package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed table layout — the PRE-SHUFFLED join: writing a table
  * `bucketBy(n, key)` hash-partitions its FILES by the key at write time
  * and records the layout in the catalog, so a join (or aggregation) on
  * that key needs NO exchange at read time — the shuffle was paid once,
  * offline, instead of on every query. At 100 TB this is the difference
  * between re-shuffling a fact table per query and never shuffling it
  * again; it composes with `sortBy` (bucket files pre-sorted on the key
  * lets sort-merge join skip its sorts when each bucket holds one file).
  *
  * Spark's bucket metadata lives in the session catalog, so the layout
  * is declared by `saveAsTable`; the data itself is plain parquet at
  * `path` (external table — survives the session, re-registered by
  * [[ensure]] on the next one). Both join sides must use the SAME bucket
  * count on the join key; [[colocatedJoin]] adds the `merge` hint so the
  * planner proves the point (no broadcast fallback hiding the exchange).
  */
object BucketedLayout {

  /** Register-or-build: write `df` as a bucketed external table on first
    * call for `path`, re-register the existing files on later sessions.
    * Idempotent — the offline-layout lifecycle (Bench calls it in
    * setup, same as the IVF/LSH index builds). */
  def ensure(spark: SparkSession, table: String, path: String,
      key: String, buckets: Int)(build: => DataFrame): Unit = {
    if (!spark.catalog.tableExists(table)) {
      val done = new java.io.File(s"$path/_SUCCESS")
      if (done.exists()) {
        // data written by a previous session — re-declare the layout
        // (bucketing DDL requires the explicit column list; one footer
        // read recovers it)
        val cols = spark.read.parquet(path).schema.toDDL
        spark.sql(
          s"""CREATE TABLE $table ($cols) USING parquet
             |CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
             |LOCATION '$path'""".stripMargin)
        ()
      } else {
        build.write.format("parquet").mode("overwrite")
          .bucketBy(buckets, key).sortBy(key)
          .option("path", path)
          .saveAsTable(table)
      }
    }
  }

  /** Join two same-bucketed tables on the bucket key with the `merge`
    * hint: the plan MUST be scan → sort-merge join with zero shuffle
    * exchanges on either input (asserted by BucketedJoinSpec). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      usingKeys: Seq[String]): DataFrame =
    spark.table(left).hint("merge")
      .join(spark.table(right).hint("merge"), usingKeys)
}
