package graft

import org.apache.spark.sql.DataFrame

/** Registry of persisted DataFrames handed across operator boundaries
  * (e.g. [[operators.ConnectedComponents.labels]] returns a persisted
  * frame its caller consumes lazily, so the producer can't unpersist it).
  * Producers `retain` such frames; a session owner (Verify, Bench, specs,
  * a production driver's shutdown hook) calls [[releaseAll]] when the
  * logical job is over, so no cached partitions outlive the run. */
object Resources {
  private val retained = scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Track a persisted frame for later release; returns it unchanged. */
  def retain(df: DataFrame): DataFrame = synchronized {
    retained += df
    df
  }

  /** Unpersist every retained frame (blocking=false: eviction proceeds
    * asynchronously; correctness never depended on the cache). Safe to
    * call twice or while queries on other sessions run — unpersist on an
    * already-released frame is a no-op. */
  def releaseAll(): Unit = synchronized {
    retained.foreach { df =>
      try df.unpersist()
      catch { case _: Throwable => () }
    }
    retained.clear()
  }
}
