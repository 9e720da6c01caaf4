package graft.streaming

import graft.operators.EventsOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured-Streaming CLI: streams the events table through the SAME
  * tumbling aggregation the batch path uses (EventsOps — one definition,
  * two execution modes), with watermarked event time and a memory sink.
  *
  * Usage: runMain graft.streaming.StreamRunner [sfDir] [width] [watermark]
  */
object StreamRunner {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val width = if (args.length > 1) args(1) else "1 hour"
    val watermark = if (args.length > 2) args(2) else "10 minutes"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // events.parquet carries INT64 nano timestamps → read raw, truncate to µs.
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // File streams read directories; stage the single events file into one.
    val stageDir = java.nio.file.Files.createTempDirectory("graft-stream-in")
    java.nio.file.Files.createSymbolicLink(
      stageDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))

    val stream = spark.readStream.schema(schema)
      .parquet(stageDir.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

    val agg = EventsOps.tumblingStatsStreaming(stream, width, watermark)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("stream_out").start()
    q.processAllAvailable()
    q.stop()

    val out = spark.table("stream_out")
    val n = out.count()
    val windows = out.agg(countDistinct(col("window_start"))).head().getLong(0)
    println(s"STREAM OK: $n windowed rows, $windows distinct windows, width=$width, watermark=$watermark")
    out.orderBy(desc("n_events")).show(5, truncate = false)
    spark.stop()
  }
}
