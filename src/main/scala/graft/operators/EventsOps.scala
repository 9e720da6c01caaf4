package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream operators. Each transformation is written once against an
  * unbounded-friendly shape (time windows, watermark-compatible aggregations)
  * and applied identically to a batch DataFrame or a readStream DataFrame —
  * the batch run is also the oracle-checkable form.
  */
object EventsOps {

  /** Tumbling-window counts and exact (decimal) sums per event type.
    * `exactDistinct` = false swaps count_distinct for approx_count_distinct —
    * required on the streaming path (Spark's streaming planner rejects exact
    * distinct aggregation) and the right trade at 100 TB anyway.
    */
  def tumblingStats(events: DataFrame, width: String,
      exactDistinct: Boolean = true): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (if (exactDistinct) count_distinct(col("user_id"))
         else approx_count_distinct(col("user_id"))).as("n_users"),
        sum(col("value").cast(DecimalType(18, 2))).as("sum_value_dec"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("n_users"),
        col("sum_value_dec").cast("double").as("sum_value"))

  /** Same aggregation with a watermark, for streaming use. */
  def tumblingStatsStreaming(events: DataFrame, width: String,
      watermark: String): DataFrame =
    tumblingStats(events.withWatermark("ts", watermark), width,
      exactDistinct = false)

  /** Session windows per user (gap-based). Streaming-capable via
    * session_window; in batch it is the oracle for the streaming path.
    */
  def sessionStats(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).as("sum_value_dec"))
      .select(
        col("w.start").as("session_start"),
        col("w.end").as("session_end"),
        col("user_id"), col("n_events"),
        col("sum_value_dec").cast("double").as("sum_value"))
}
