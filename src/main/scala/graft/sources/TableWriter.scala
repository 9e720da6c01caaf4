package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Materialization sink (SURVEY §2.1 S3) — the engine analogue of dbt's
  * `+materialized: table` (reference dbt_project.yml:14-16: every model is a
  * physical table rebuild). Parquet, overwrite semantics, optional partition
  * columns: rollup outputs should partition by their `date_period` grain so
  * downstream reads prune partitions instead of scanning history.
  */
final class TableWriter(warehouseDir: String) extends Serializable {

  def path(name: String): String = s"$warehouseDir/$name"

  def materialize(name: String, df: DataFrame,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): String = {
    val w = df.write.mode(mode)
    val withParts = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    withParts.parquet(path(name))
    path(name)
  }

  def read(spark: org.apache.spark.sql.SparkSession, name: String): DataFrame =
    spark.read.parquet(path(name))

  /** Incremental materialization (the dbt `incremental` analogue on plain
    * parquet): dynamic partition overwrite replaces ONLY the partitions
    * present in `df`, leaving history untouched — the idempotent daily-load
    * pattern at 100 TB (re-running a day rewrites just that day's
    * partition).
    */
  def upsertPartitions(df: DataFrame, name: String,
      partitionBy: Seq[String]): String = {
    require(partitionBy.nonEmpty, "incremental upsert needs partition columns")
    // Scoped to this write only — mutating the session conf would silently
    // turn later full-rebuild overwrites into partial (dynamic) ones.
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionBy: _*)
      .parquet(path(name))
    path(name)
  }

  /** Bucketed materialization: pre-shuffles the table into `numBuckets` by
    * `bucketCols` so equi-joins and aggregations on those keys read
    * co-located buckets with NO runtime exchange — the cluster-scale answer
    * to repeated joins on the same key (bucket both fact tables identically
    * and the 100 TB join is shuffle-free). Registered in the session catalog
    * (bucketing metadata lives there).
    */
  def materializeBucketed(df: DataFrame, name: String, bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path(name))
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(name)
}
