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
}
