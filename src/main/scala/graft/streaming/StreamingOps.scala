package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Native Structured-Streaming operators over the event stream — the
  * Spark-first §2.6 surface beyond the reference's stateless
  * foreachBatch broker shape: event-time watermarked windowed
  * aggregation, and cross-batch per-key state via mapGroupsWithState.
  * Each has a batch-mode twin so tests can assert batch == stream.
  */
object StreamingOps {

  /** Watermarked tumbling-window counts per key: the standard
    * monitoring aggregation (alerts per class per window). Watermark
    * bounds state: closed windows are emitted and dropped, so state
    * size is O(active windows), not O(stream length).
    */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
      windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value"))

  /** Batch twin of [[windowedCounts]] (same plan minus the watermark). */
  def windowedCountsBatch(events: DataFrame, tsCol: String,
      keyCol: String, windowLength: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col(keyCol),
        col("n"), col("sum_value"))

  final case class UserEvent(user_id: Long, value: Double)
  final case class UserState(n: Long, maxValue: Double)

  /** Cross-batch per-user running aggregate via mapGroupsWithState:
    * each micro-batch updates (count, max) state and emits the running
    * value — the KeyValueGroupedDataset custom-state shape the brief
    * prescribes for semantics windows/aggregations can't express.
    * State is per-key and partition-local after the groupBy shuffle, so
    * it scales with distinct keys across executors.
    */
  def runningUserStats(spark: SparkSession, events: DataFrame)
      : Dataset[(Long, Long, Double)] = {
    import spark.implicits._
    events.select(col("user_id"), col("value")).as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, Double.NegativeInfinity))
          var n = prev.n
          var mx = prev.maxValue
          rows.foreach { e =>
            n += 1
            if (e.value > mx) mx = e.value
          }
          state.update(UserState(n, mx))
          (user, n, mx)
      }
  }
}
