package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism guard for CPU-heavy narrow stages (classifier UDFs, regex
  * banks, codec decode). A small parquet scan yields as few as ONE input
  * split, and every narrow transform downstream inherits it — a 32-core
  * session then runs the whole classifier on one core. At 100 TB the scan
  * has thousands of splits and this is a no-op; the guard only pays a
  * shuffle when the source is too small for one to matter.
  */
object Parallelism {

  /** Spread `df` out to the session's default parallelism iff its
    * current partition count is below half of it. The redistribution runs
    * at the RDD level on purpose: a DataFrame `repartition(n)` is an AQE
    * exchange, and when that exchange is REUSED by several consumers
    * AQE's size-based coalescing folded the small-but-CPU-heavy consumer
    * stages back to one task each (observed on the classifier's three
    * arms). The RDD boundary is invisible to AQE, and it only ever runs
    * under the guard — tiny inputs, where the row round-trip is noise.
    *
    * Rows are assigned by CONTENT hash, not round-robin: round-robin
    * depends on input iteration order, which is not retry-stable after a
    * shuffle fetch; a content hash gives every row the same partition on
    * any attempt, in any order.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < (target + 1) / 2) {
      val redistributed = df.rdd
        .keyBy(r => java.lang.Math.floorMod(r.hashCode, target))
        .partitionBy(new org.apache.spark.HashPartitioner(target))
        .values
      df.sparkSession.createDataFrame(redistributed, df.schema)
    } else df
  }
}
