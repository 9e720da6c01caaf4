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
    * The `events` table stores INT64 TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; it is read as raw nanos and truncated to microsecond
    * timestamps (exactly what engines with native ns support do on read).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
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
      raw.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
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
