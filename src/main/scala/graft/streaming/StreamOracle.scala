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

  /** Streams `agg` (a streaming aggregation) into a complete-mode memory
    * sink named `name`, processes everything available, stops the query,
    * and returns the converged table. The view is re-created per call so
    * repeated invocations (Bench runs every query twice) don't collide or
    * accrete state.
    */
  def converge(agg: DataFrame, name: String): DataFrame = {
    val spark = agg.sparkSession
    spark.catalog.dropTempView(name)
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
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
    val q = out.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
