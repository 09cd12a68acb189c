package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Custom streaming state: running per-sensor statistics via
  * `flatMapGroupsWithState` (SURVEY.md §2.2 streaming-stateful surface).
  *
  * The reference's only state is its schema cache (db/db.go:18-22); this
  * is the engine's demonstration of arbitrary keyed state on the record
  * stream: per `tableName`, a running (count, sum, min, max) that
  * survives across micro-batches in the state store (checkpointed,
  * partitioned by key — scales horizontally with sensors).
  */
object SensorStats {

  final case class SensorState(count: Long, sum: Double, min: Double, max: Double)
  final case class SensorUpdate(tableName: String, count: Long, mean: Double,
      min: Double, max: Double)

  /** records: output of [[graft.ingest.Ingest.records]] (streaming or
    * batch-with-state-disabled); only Float64-typed rows carry values. */
  def runningStats(records: DataFrame): Dataset[SensorUpdate] = {
    import records.sparkSession.implicits._
    records
      .filter($"value_type" === "Float64")
      .select($"tableName", $"value_d")
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)],
            state: GroupState[SensorState]) =>
          val prev = state.getOption.getOrElse(
            SensorState(0L, 0.0, Double.MaxValue, Double.MinValue))
          var c = prev.count; var s = prev.sum
          var mn = prev.min; var mx = prev.max
          rows.foreach { case (_, v) =>
            c += 1; s += v
            if (v < mn) mn = v
            if (v > mx) mx = v
          }
          if (c == prev.count) Iterator.empty
          else {
            val next = SensorState(c, s, mn, mx)
            state.update(next)
            Iterator.single(SensorUpdate(key, c, s / c, mn, mx))
          }
      }
  }
}
