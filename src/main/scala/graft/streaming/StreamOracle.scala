package graft.streaming

import org.apache.spark.sql.DataFrame

/** Runs a streaming aggregation to convergence over a FINITE source and
  * hands back the full result as a queryable table — the bridge that puts
  * the REAL `readStream` path (streaming planner, state store, incremental
  * execution) under the same DuckDB oracle as every batch query.
  *
  * Complete output mode is what makes the converged sink provably equal to
  * the batch answer: append mode can never emit sessions/windows still
  * inside the watermark delay when the source runs dry, so its sink is a
  * strict subset of the batch result on any finite input. Complete mode's
  * final micro-batch IS the whole aggregation state — once
  * `processAllAvailable` returns, the memory table equals what the batch
  * plan computes, and any divergence in the streaming operators (state
  * merge, session merge, decimal sums) fails the hash compare.
  */
object StreamOracle {

  /** Stateful streaming operators pin `spark.sql.shuffle.partitions` at
    * query start as the STATE partition count, and every state partition
    * pays fixed per-microbatch costs (state-store instance, checkpoint
    * delta files — a stream-stream join keeps FOUR stores per partition).
    * A production deployment sizes this to key cardinality and throughput;
    * these finite oracle queries converge in 1–3 microbatches where the
    * per-partition fixed cost dominates the per-row work, so they run at a
    * smaller state parallelism (override: SPARK_GRAFT_STREAM_PARTITIONS).
    * Results are partitioning-independent — only the batch session conf is
    * restored afterwards.
    */
  private def withStatePartitions[T](
      spark: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prior = spark.conf.get(key)
    spark.conf.set(key, sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "8"))
    try body finally spark.conf.set(key, prior)
  }

  /** Streams `agg` (a streaming aggregation) into a complete-mode memory
    * sink named `name`, processes everything available, stops the query,
    * and returns the converged table. The view is re-created per call so
    * repeated invocations (Bench runs every query twice) don't collide or
    * accrete state.
    */
  def converge(agg: DataFrame, name: String): DataFrame = {
    val spark = agg.sparkSession
    spark.catalog.dropTempView(name)
    withStatePartitions(spark) {
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.table(name)
  }

  /** Append-mode variant for operators that only exist in append output
    * (flatMapGroupsWithState). Append converges on a finite source only
    * when the CALLER arranges watermark advancement past every row it
    * expects emitted — e.g. by staging sentinel rows after the real data
    * (see q54: per-key flush events whose own state never emits).
    */
  def convergeAppend(out: DataFrame, name: String): DataFrame = {
    val spark = out.sparkSession
    spark.catalog.dropTempView(name)
    withStatePartitions(spark) {
      val q = out.writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    spark.table(name)
  }
}
