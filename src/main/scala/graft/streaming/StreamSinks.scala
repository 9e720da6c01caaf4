package graft.streaming

import graft.sources.TableWriter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Streaming delivery into the engine's incremental parquet materialization:
  * each micro-batch lands via dynamic-partition upsert (TableWriter), so a
  * replayed batch rewrites the same partitions instead of duplicating them —
  * idempotent, restart-safe delivery on plain parquet. Pair with an
  * append-mode watermarked aggregation (finalized windows only) and the
  * table converges to exactly the batch result.
  */
object StreamSinks {

  /** Sink an append-mode windowed aggregation (must carry `window_start`)
    * into `table`, partitioned by hour.
    */
  def hourlyPartitionedSink(agg: DataFrame, writer: TableWriter,
      table: String): DataStreamWriter[Row] =
    agg.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          writer.upsertPartitions(
            batch.withColumn("date_period",
              date_format(col("window_start"), "yyyy-MM-dd-HH")),
            table, Seq("date_period"))
        }
        ()
    }

  def start(agg: DataFrame, writer: TableWriter, table: String): StreamingQuery =
    hourlyPartitionedSink(agg, writer, table).start()
}
