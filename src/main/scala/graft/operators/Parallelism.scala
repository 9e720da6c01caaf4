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
    * current partition count is below half of it. The redistribution runs
    * at the RDD level on purpose: a DataFrame `repartition(n)` is an AQE
    * exchange, and AQE's SIZE-based coalescing folds a small-but-CPU-heavy
    * stage straight back to one partition (observed: the classifier's
    * 16-way repartition re-coalesced to 1 task). The RDD boundary is
    * invisible to AQE, and it only ever runs under the guard — tiny
    * inputs, where the row round-trip is noise. Distribution is
    * deterministic (RDD round-robin seeds by partition index).
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < (target + 1) / 2)
      df.sparkSession.createDataFrame(df.rdd.repartition(target), df.schema)
    else df
  }
}
