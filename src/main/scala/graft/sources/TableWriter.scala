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

  /** Incremental MERGE materialization (dbt's `incremental` +
    * `merge` strategy on plain parquet): upsert `incoming` by `key` into
    * the table, rewriting ONLY the key-hash bucket partitions the batch
    * touches. The table is laid out with a derived `__bucket =
    * pmod(xxhash64(key), numBuckets)` partition column — hash-derived so
    * ANY key type works (string business keys are the common dbt case),
    * pinned to INT so the incoming side and the partition-inferred
    * re-read side agree exactly. A merge reads just the affected
    * buckets, keeps the newest row per key (incoming wins ties), and
    * dynamic-partition-overwrites those buckets — untouched buckets are
    * never read or rewritten, so a daily trickle of updates costs
    * O(touched buckets), not a table rewrite. (Table formats with
    * merge-on-read do this with finer granularity; the bucket-scoped
    * rewrite is the honest plain-parquet equivalent.) The incoming batch
    * must carry at most one row per key.
    */
  def mergeByKey(spark: org.apache.spark.sql.SparkSession, name: String,
      incoming: DataFrame, key: String, numBuckets: Int = 16): String = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val withBucket = incoming
      .withColumn("__bucket",
        pmod(xxhash64(col(key)), lit(numBuckets.toLong)).cast("int"))
      .withColumn("__gen", lit(1))
    val p = new org.apache.hadoop.fs.Path(path(name))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val merged = if (!fs.exists(p)) withBucket
    else {
      // bounded collect: ≤ numBuckets ids
      val affected = withBucket.select("__bucket").distinct()
        .collect().map(_.getInt(0))
      val existing = spark.read.parquet(path(name))
        .withColumn("__bucket", col("__bucket").cast("int"))
        .filter(col("__bucket").isin(affected: _*))
        .withColumn("__gen", lit(0))
      val w = Window.partitionBy(col(key))
        .orderBy(col("__gen").desc) // incoming wins
      existing.unionByName(withBucket)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    // stage first (the dynamic overwrite would otherwise overwrite a path
    // its own plan is reading); always clean the scratch dir — a failure
    // between stage write and overwrite must not leave __stage_* shadowing
    // the table namespace
    val stage = path(s"__stage_$name")
    try {
      merged.drop("__gen").write.mode(SaveMode.Overwrite).parquet(stage)
      spark.read.parquet(stage).write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__bucket")
        .parquet(path(name))
    } finally {
      val sp = new org.apache.hadoop.fs.Path(stage)
      sp.getFileSystem(spark.sessionState.newHadoopConf()).delete(sp, true)
    }
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
