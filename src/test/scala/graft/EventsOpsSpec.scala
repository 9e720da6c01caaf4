package graft

import graft.operators.EventsOps
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventsOpsSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  val events = Seq(
    (1L, ts("2024-01-01 00:05:00"), 10L, "click", 1.5),
    (2L, ts("2024-01-01 00:45:00"), 10L, "click", 2.5),
    (3L, ts("2024-01-01 01:05:00"), 11L, "view", 4.0),
    (4L, ts("2024-01-01 01:30:00"), 10L, "click", 0.5))
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("tumblingStats: hourly windows with exact sums") {
    val got = EventsOps.tumblingStats(events, "1 hour")
      .orderBy("window_start", "event_type")
      .select(col("window_start").cast("string"), col("event_type"),
        col("n_events"), col("n_users"), col("sum_value"))
      .as[(String, String, Long, Long, Double)].collect()
    assert(got.toSeq == Seq(
      ("2024-01-01 00:00:00", "click", 2L, 1L, 4.0),
      ("2024-01-01 01:00:00", "click", 1L, 1L, 0.5),
      ("2024-01-01 01:00:00", "view", 1L, 1L, 4.0)))
  }

  test("sessionStats: 30-minute gap sessionization") {
    val got = EventsOps.sessionStats(events, "30 minutes")
      .filter(col("user_id") === 10L)
      .orderBy("session_start")
      .select(col("n_events")).as[Long].collect()
    // user 10: 00:05 alone; 00:45 alone (gap 40m); 01:30 alone
    assert(got.toSeq == Seq(1L, 1L, 1L))
  }

  test("streaming path produces the same hourly aggregation as batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    events.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream.schema(events.schema).parquet(dir)
    val agg = EventsOps.tumblingStatsStreaming(stream, "1 hour", "10 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly_out")
        .orderBy("window_start", "event_type")
        .select(col("window_start").cast("string"), col("event_type"), col("n_events"))
        .as[(String, String, Long)].collect()
      assert(got.toSeq == Seq(
        ("2024-01-01 00:00:00", "click", 2L),
        ("2024-01-01 01:00:00", "click", 1L),
        ("2024-01-01 01:00:00", "view", 1L)))
    } finally q.stop()
  }
}
