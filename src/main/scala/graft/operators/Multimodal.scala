package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column support for training-data pipelines: image/audio/video
  * payloads travel as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run as batched
  * per-partition transformations.
  *
  * The Spark-side plumbing — schema, partition sizing, batch iteration shape,
  * deterministic outputs — is real and tested. The codec calls themselves are
  * STUBS (`FakeCodec`): this container has no image/audio libraries, so the
  * stub derives deterministic pseudo-content from the bytes. Swapping in a
  * real codec is a one-function change (`Codec` trait).
  */
object Multimodal {

  /** media struct: payload + typed metadata, the storage convention for all
    * modalities. Partition media tables by (modality, shard) at scale;
    * payloads dominate size so `spark.sql.files.maxPartitionBytes` governs
    * scan parallelism, not row counts.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),  // image|audio|video
    StructField("mime", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("duration_ms", LongType), StructField("sample_rate", IntegerType))))))

  /** Pluggable codec boundary. Implementations must be deterministic pure
    * functions of the payload (idempotent re-runs, exactly-once-safe).
    */
  trait Codec extends Serializable {
    def imageFeatures(bytes: Array[Byte], dim: Int): Array[Float]
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte]
    def videoFrame(bytes: Array[Byte], frameIdx: Int): Array[Byte]
  }

  /** STUB codec — deterministic fake: features are seeded by a rolling hash
    * of the payload; resize re-headers the payload; frames are byte slices.
    * ??? -> replace with a JNI/javacpp-backed codec in a real deployment.
    */
  object FakeCodec extends Codec {
    private def hash64(bytes: Array[Byte], seed: Long): Long = {
      var h = seed ^ 0x9E3779B97F4A7C15L
      var i = 0
      while (i < bytes.length) {
        h = (h ^ bytes(i)) * 0x100000001B3L
        i += 1
      }
      h
    }
    def imageFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        val h = hash64(bytes, i.toLong)
        out(i) = (h % 1000L) / 1000.0f
        i += 1
      }
      out
    }
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      // STUB: a real implementation re-encodes; the fake keeps a size-
      // proportional prefix so downstream size accounting stays meaningful.
      val keep = math.max(4, math.min(bytes.length, (w.toLong * h / 64).toInt))
      java.util.Arrays.copyOf(bytes, keep)
    }
    def videoFrame(bytes: Array[Byte], frameIdx: Int): Array[Byte] = {
      if (bytes.isEmpty) return bytes
      val n = math.max(1, bytes.length / 16)
      val start = math.min(bytes.length - 1, frameIdx * n)
      java.util.Arrays.copyOfRange(bytes, start, math.min(bytes.length, start + n))
    }
  }

  /** Feature extraction: binary → `array<float>` embedding column. Runs as a
    * deterministic UDF over the payload — one pass, no shuffle; the scan's
    * partitioning carries through, so this parallelizes exactly like the
    * underlying file layout.
    */
  def imageFeatureCol(bytes: Column, dim: Int, codec: Codec = FakeCodec): Column = {
    val f = udf((b: Array[Byte]) =>
      if (b == null) null else codec.imageFeatures(b, dim))
    f(bytes)
  }

  /** Resize: payload → payload, metadata struct updated in the same pass. */
  def resize(df: DataFrame, w: Int, h: Int, codec: Codec = FakeCodec): DataFrame = {
    val f = udf((b: Array[Byte]) => if (b == null) null else codec.resize(b, w, h))
    df.withColumn("bytes", f(col("bytes")))
      .withColumn("meta", col("meta")
        .withField("width", lit(w)).withField("height", lit(h)))
  }

  /** Frame sampling: one row per sampled frame (`frame_idx`, `frame_bytes`).
    * posexplode keeps it a Generate — no shuffle; downstream per-frame work
    * inherits the scan partitioning × frames-per-video fan-out.
    */
  def sampleFrames(df: DataFrame, nFrames: Int, codec: Codec = FakeCodec): DataFrame = {
    val f = udf((b: Array[Byte]) =>
      if (b == null) Array.empty[Array[Byte]]
      else Array.tabulate(nFrames)(i => codec.videoFrame(b, i)))
    df.withColumn("frames", f(col("bytes")))
      .select(col("media_id"), posexplode(col("frames")).as(Seq("frame_idx", "frame_bytes")))
  }

  /** Batched per-partition processing — the Scala analogue of mapInPandas:
    * rows stream through in fixed-size batches (the Arrow-batch shape codec
    * libraries want), the codec callback sees a whole batch, and output
    * rows flatten back into the partition iterator. No shuffle; partition
    * boundaries and ordering within a partition are preserved.
    */
  def mapBatched(df: DataFrame, batchSize: Int,
      outSchema: StructType)(fn: Seq[org.apache.spark.sql.Row] => Seq[org.apache.spark.sql.Row]): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions(it => it.grouped(batchSize).flatMap(fn))(enc)
  }

  /** Size-aware repartitioning for payload-heavy frames: target a byte
    * budget per partition (payload rows are wildly skewed; row-count
    * partitioning would OOM on the heavy tail).
    */
  def repartitionByBytes(df: DataFrame, targetBytesPerPartition: Long): DataFrame = {
    val row = df.agg(sum(length(col("bytes"))).cast("long")).head()
    val totalBytes = if (row.isNullAt(0)) 0L else row.getLong(0)
    val parts = math.max(1, (totalBytes / math.max(1L, targetBytesPerPartition)).toInt)
    df.repartition(parts)
  }
}
