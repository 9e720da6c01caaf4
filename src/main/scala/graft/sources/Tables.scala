package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source-table access (SURVEY §2.1 S1/S2). Tables are parquet files named
  * `<table>.parquet` under a scale-factor directory; seeds are small
  * broadcast-sized CSVs with explicit schemas (never inferSchema — schema
  * drift would silently change join semantics at scale).
  */
object Tables {

  val testdataTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Read one parquet table from a scale-factor dir. Column pruning and
    * predicate pushdown reach the scan because this stays a plain relation.
    *
    * The `events` table's `ts` column has shipped in two physical encodings
    * across testdata generations: INT64 TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects — read as raw nanos via the legacy conf and
    * truncated to microseconds) and plain `timestamp[us]` without UTC
    * adjustment (which Spark reads as TIMESTAMP_NTZ). Branch on the type
    * Spark actually loaded so either vintage yields an identical
    * session-UTC TIMESTAMP column and every downstream consumer (windows,
    * watermarks, the DuckDB oracle) sees the same values.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts", normalizeTs(raw.schema("ts").dataType))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  /** `ts` → session-UTC TIMESTAMP regardless of the on-disk encoding.
    * Integral = raw nanos (legacy nanosAsLong read); NTZ = wall-clock
    * micros, identical values under the UTC session timezone; TIMESTAMP =
    * already what we want.
    */
  private def normalizeTs(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType => expr("timestamp_micros(ts div 1000)")
      case TimestampNTZType       => col("ts").cast(TimestampType)
      case TimestampType          => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other — extend Tables.normalizeTs")
    }
  }

  /** Streaming read of the same table — identical schema and `events` nano
    * handling as [[load]], so a streaming query and its batch twin consume
    * byte-identical rows. The file stream source lists directories, so the
    * single parquet file is staged behind a symlink dir (created once per
    * JVM per table path).
    */
  def loadStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/$name.parquet"
    val schema = spark.read.parquet(path).schema
    // Synchronized: TrieMap.getOrElseUpdate may run the builder twice under
    // concurrent first calls, orphaning a temp dir. One staged dir per table
    // path per JVM; the shutdown hook removes the symlink before the dir
    // (File.deleteOnExit can't — it only deletes empty dirs).
    val staged = stageDirs.synchronized {
      stageDirs.getOrElseUpdate(path, {
        val d = java.nio.file.Files.createTempDirectory(s"graft-stream-$name")
        val link = d.resolve(s"$name.parquet")
        java.nio.file.Files.createSymbolicLink(link, java.nio.file.Paths.get(path))
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          java.nio.file.Files.deleteIfExists(link)
          java.nio.file.Files.deleteIfExists(d)
        }))
        d.toString
      })
    }
    val raw = spark.readStream.schema(schema).parquet(staged)
    if (name == "events")
      raw.withColumn("ts", normalizeTs(schema("ts").dataType))
    else raw
  }

  private val stageDirs =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Seed ingest (reference `dbt seed`, SURVEY §2.1 S2): header CSV with an
    * explicit schema, empty strings as nulls — matching dbt's agate loader
    * behavior on the reference seed CSVs.
    */
  def loadSeedCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("nullValue", "")
      // RFC-4180 doubled-quote escaping (what dbt's agate loader writes);
      // Spark's default escape is backslash, which would leave `""` raw
      .option("escape", "\"")
      .schema(schema)
      .csv(path)
}
