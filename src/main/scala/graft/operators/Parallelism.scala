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

  /** Round-robin `df` out to the session's default parallelism iff its
    * current partition count is below half of it. Row set is unchanged
    * (round-robin repartition is deterministic under retry: Spark sorts
    * within partitions before distributing, SPARK-23207).
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < (target + 1) / 2) df.repartition(target)
    else df
  }
}
