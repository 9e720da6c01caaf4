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

  test("stateful sessionization closes sessions as the watermark passes") {
    import graft.operators.{Event, Session}
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString

    val part1 = Seq(
      Event(1L, ts("2024-01-01 00:00:00"), 10L, "click", 1.25),
      Event(2L, ts("2024-01-01 00:10:00"), 10L, "click", 2.50)).toDS()
    part1.write.parquet(s"$dir/p1")

    val schema = part1.schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/p*")
      .withWatermark("ts", "1 minute").as[Event]
    val sessions = graft.operators.EventsOps.statefulSessions(
      stream, gapMs = 30 * 60 * 1000)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // nothing closed yet

      // a much later event advances the watermark past session 1's close
      Seq(Event(3L, ts("2024-01-01 10:00:00"), 10L, "click", 9.0)).toDS()
        .write.parquet(s"$dir/p2")
      q.processAllAvailable()

      val got = spark.table("sess_out").as[Session].collect()
      assert(got.length == 1)
      assert(got.head.user_id == 10L)
      assert(got.head.session_start.toString == "2024-01-01 00:00:00.0")
      assert(got.head.session_end.toString == "2024-01-01 00:10:00.0")
      assert(got.head.n_events == 2L && got.head.sum_value == 3.75)
    } finally q.stop()
  }

  test("dedupEvents: streaming dropDuplicatesWithinWatermark removes replays") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    val withDup = events.union(events.limit(2)) // replayed first two events
    withDup.write.parquet(s"$dir/in")
    val stream = spark.readStream.schema(events.schema).parquet(s"$dir/in")
    val q = graft.operators.EventsOps
      .dedupEvents(stream, Seq("event_id"), Some("1 hour"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 4) // 6 rows in, 2 replays dropped
    } finally q.stop()
    // batch path: plain exact dedup
    assert(graft.operators.EventsOps.dedupEvents(withDup, Seq("event_id")).count() == 4)
  }

  test("foreachBatch sink: finalized windows land as idempotent partition upserts") {
    val inDir = java.nio.file.Files.createTempDirectory("graft-sink-in").toString
    val whDir = java.nio.file.Files.createTempDirectory("graft-sink-wh").toString
    val writer = new graft.sources.TableWriter(whDir)

    events.write.parquet(s"$inDir/p1")
    val stream = spark.readStream.schema(events.schema).parquet(s"$inDir/p*")
    val agg = EventsOps.tumblingStatsStreaming(stream, "1 hour", "10 minutes")
    val q = graft.streaming.StreamSinks.start(agg, writer, "hourly_agg")
    try {
      q.processAllAvailable()
      // late driver event pushes the watermark far past the first windows
      Seq((99L, ts("2024-01-01 09:00:00"), 12L, "view", 1.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.parquet(s"$inDir/p2")
      q.processAllAvailable()
    } finally q.stop()

    val landed = writer.read(spark, "hourly_agg")
    // the two fully-closed windows from the original events must be present
    val batchEquivalent = EventsOps.tumblingStats(events, "1 hour")
    val missing = batchEquivalent
      .filter(col("window_start") < ts("2024-01-01 02:00:00"))
      .drop("n_users") // streaming path uses approx distinct
      .exceptAll(landed.drop("n_users", "date_period"))
    assert(missing.isEmpty, "closed windows missing from the sink table")
  }

  test("stream-stream interval join matches the batch interval join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ssj").toString
    val clicks = events.filter(col("event_type") === "click")
    // views for the same user so the interval join has matches: one inside
    // the ±2h bound of each click, one far outside
    val views = Seq(
      (20L, ts("2024-01-01 00:30:00"), 10L, "view", 5.0),
      (21L, ts("2024-01-03 09:00:00"), 10L, "view", 6.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    clicks.write.parquet(s"$dir/clicks")
    views.write.parquet(s"$dir/views")

    val batchJoined = EventsOps.intervalJoin(clicks, views, "user_id",
      before = "2 hours", after = "2 hours", watermark = "10 minutes")
    val cs = spark.readStream.schema(events.schema).parquet(s"$dir/clicks")
    val vs = spark.readStream.schema(events.schema).parquet(s"$dir/views")
    val q = EventsOps.intervalJoin(cs, vs, "user_id",
        before = "2 hours", after = "2 hours", watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("ssj_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssj_out")
      assert(got.count() == batchJoined.count() && got.count() > 0)
      assert(got.exceptAll(batchJoined).isEmpty)
    } finally q.stop()
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
