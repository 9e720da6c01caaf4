package graft

import org.apache.spark.sql.functions._

/** Funnel (q101) and cohort retention (q102) semantics on hand fixtures:
  * strict in-order conversion (a purchase BEFORE the click never
  * completes the funnel), and exact week offsets from first-event
  * cohorts. Runs the registered entries against a temp parquet dir
  * shaped like the events table.
  */
class FunnelRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    rows.toDF("user_id", "event_type", "ts_s")
      .select(col("user_id") + 0L as "event_id", // schema-compatible extras
        to_timestamp(col("ts_s")).as("ts"), col("user_id"),
        col("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("funnel requires strict event order per user") {
    val dir = eventsDir(Seq(
      // user 1: full in-order funnel
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      // user 2: purchase BEFORE click — stops at view→click
      (2L, "view", "2024-01-02 10:00:00"),
      (2L, "purchase", "2024-01-02 10:30:00"),
      (2L, "click", "2024-01-02 11:00:00"),
      // user 3: clicks but never viewed — not even stage 1
      (3L, "click", "2024-01-03 10:00:00"),
      (3L, "purchase", "2024-01-03 11:00:00"),
      // user 4: view only
      (4L, "view", "2024-01-04 10:00:00")))
    val r = SparkEntry.queries("q101_funnel")(spark, dir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 1L)))
  }

  test("retention offsets count from each user's first-event week") {
    val dir = eventsDir(Seq(
      (1L, "view", "2024-01-01 10:00:00"), // Mon wk0
      (1L, "view", "2024-01-09 10:00:00"), // wk1 (Tue)
      (1L, "view", "2024-01-22 10:00:00"), // wk3
      (2L, "view", "2024-01-10 10:00:00"), // cohort wk of Jan 8
      (2L, "view", "2024-01-15 10:00:00"))) // next week
    val out = SparkEntry.queries("q102_retention")(spark, dir)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L), ("2024-01-01", 3L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 1L, 1L)))
  }
}
