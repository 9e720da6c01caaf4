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
  * deterministic outputs — is real and tested, and so are all three decode
  * paths, dependency-free on the JDK: IMAGE via [[ImageIOCodec]]
  * (javax.imageio JPEG/PNG decode, bilinear resize, luminance-grid
  * features), PCM AUDIO via [[JavaSoundCodec]] (javax.sound.sampled
  * WAV/AIFF/AU decode, RMS + zero-crossing features), and VIDEO via GIF
  * (multi-frame compositing with offsets and disposal, single sequential
  * pass) or AVI ([[AviDecoder]]: RIFF container walk; MJPEG frames decode
  * through javax.imageio, uncompressed BI_RGB DIB frames through a raw
  * raster reader). A container none of those cover (MP4/WebM — their
  * codecs need a native library) throws a clear error rather than
  * producing fake output; a wider decoder slots in behind the same
  * `Codec` trait.
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
    /** Batch form: decode the requested frames in ONE pass over the
      * container (video decoders are sequential — per-frame calls would be
      * O(n²) in the sample count). Default delegates to [[videoFrame]].
      */
    def videoFrames(bytes: Array[Byte], frameIdxs: Array[Int]): Array[Array[Byte]] =
      frameIdxs.map(videoFrame(bytes, _))
  }

  /** Real image codec on the JDK's built-in javax.imageio — decodes
    * JPEG/PNG/BMP/GIF payloads, extracts a luminance-grid feature vector,
    * and resizes via bilinear Graphics2D re-encode (PNG out, lossless and
    * byte-deterministic for a given raster). Video payloads decode when
    * the container is a GIF (composited here) or an AVI ([[AviDecoder]]);
    * anything else throws.
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

    /** True when the payload is a GIF container (the one video-like format
      * the JDK decodes natively — multi-frame, frame offsets, disposal).
      */
    private def isGif(bytes: Array[Byte]): Boolean =
      bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8'

    /** Decode GIF frames `frameIdxs` (composited, PNG-encoded full frames)
      * in one sequential pass. GIF frames are deltas: each raster lands at
      * an (x, y) offset on the logical screen, and the previous content
      * persists unless the frame's disposal method says otherwise — so
      * frame i requires compositing frames 0..i. Indexes past the last
      * frame clamp to it (deterministic tail sampling).
      */
    private def gifFrames(bytes: Array[Byte],
        frameIdxs: Array[Int]): Array[Array[Byte]] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "no GIF reader registered")
      val reader = readers.next()
      reader.setInput(iis, false)
      try {
        val n = reader.getNumImages(true)
        require(n > 0, "GIF payload has no frames")
        // logical screen from stream metadata; fall back to frame 0 extent
        val (sw, sh) = {
          val t = Option(reader.getStreamMetadata).map(
            _.getAsTree("javax_imageio_gif_stream_1.0"))
          val lsd = t.flatMap { tree =>
            val kids = tree.getChildNodes
            (0 until kids.getLength).map(kids.item)
              .find(_.getNodeName == "LogicalScreenDescriptor")
          }
          lsd.map { d =>
            val a = d.getAttributes
            (a.getNamedItem("logicalScreenWidth").getNodeValue.toInt,
              a.getNamedItem("logicalScreenHeight").getNodeValue.toInt)
          }.getOrElse {
            val f0 = reader.read(0); (f0.getWidth, f0.getHeight)
          }
        }
        val canvas = new java.awt.image.BufferedImage(sw, sh,
          java.awt.image.BufferedImage.TYPE_INT_ARGB)
        val last = n - 1
        val stopAt = math.min(frameIdxs.max, last)
        val snapshots = new java.util.HashMap[Int, Array[Byte]]()
        val wanted = frameIdxs.map(math.min(_, last)).toSet
        var i = 0
        while (i <= stopAt) {
          val frame = reader.read(i)
          val md = reader.getImageMetadata(i)
            .getAsTree("javax_imageio_gif_image_1.0")
          val kids = md.getChildNodes
          var x = 0; var y = 0; var disposal = "none"
          var k = 0
          while (k < kids.getLength) {
            val node = kids.item(k)
            node.getNodeName match {
              case "ImageDescriptor" =>
                val a = node.getAttributes
                x = a.getNamedItem("imageLeftPosition").getNodeValue.toInt
                y = a.getNamedItem("imageTopPosition").getNodeValue.toInt
              case "GraphicControlExtension" =>
                disposal = node.getAttributes
                  .getNamedItem("disposalMethod").getNodeValue
              case _ => ()
            }
            k += 1
          }
          // restoreToPrevious: the canvas must revert to its pre-frame
          // state after this frame displays — save the covered rect first
          val saved =
            if (disposal == "restoreToPrevious")
              canvas.getSubimage(x, y,
                math.min(frame.getWidth, sw - x),
                math.min(frame.getHeight, sh - y))
                .getRGB(0, 0, math.min(frame.getWidth, sw - x),
                  math.min(frame.getHeight, sh - y), null, 0,
                  math.min(frame.getWidth, sw - x))
            else null
          val gfx = canvas.createGraphics()
          try gfx.drawImage(frame, x, y, null) finally gfx.dispose()
          if (wanted.contains(i)) {
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(canvas, "png", bos)
            snapshots.put(i, bos.toByteArray)
          }
          disposal match {
            case "restoreToBackgroundColor" =>
              // clear the frame's rect back to transparent
              val g2 = canvas.createGraphics()
              try {
                g2.setComposite(java.awt.AlphaComposite.Clear)
                g2.fillRect(x, y, frame.getWidth, frame.getHeight)
              } finally g2.dispose()
            case "restoreToPrevious" =>
              val w = math.min(frame.getWidth, sw - x)
              val h = math.min(frame.getHeight, sh - y)
              canvas.setRGB(x, y, w, h, saved, 0, w)
            case _ => ()
          }
          i += 1
        }
        frameIdxs.map(idx => snapshots.get(math.min(idx, last)))
      } finally {
        reader.dispose()
        iis.close()
      }
    }

    def videoFrame(bytes: Array[Byte], frameIdx: Int): Array[Byte] =
      videoFrames(bytes, Array(frameIdx))(0)

    override def videoFrames(bytes: Array[Byte],
        frameIdxs: Array[Int]): Array[Array[Byte]] =
      if (frameIdxs.isEmpty) Array.empty
      else if (isGif(bytes)) gifFrames(bytes, frameIdxs)
      else if (AviDecoder.isAvi(bytes)) AviDecoder.frames(bytes, frameIdxs)
      else throw new IllegalArgumentException(
        s"no pure-JVM decoder for this video container " +
          s"(${bytes.length} bytes; GIF and AVI MJPEG/DIB are supported — " +
          "MP4/WebM need a native-codec-backed Codec implementation)")
  }

  /** Pure-JVM AVI (RIFF) video decoder: one walk over the chunk tree
    * collects the video stream's BITMAPINFOHEADER and the ordered frame
    * chunks ('NNdb'/'NNdc' for stream NN, including inside 'rec ' lists);
    * frames then decode by compression — 'MJPG' frames are JPEG payloads
    * (javax.imageio), BI_RGB (compression 0) frames are raw bottom-up
    * BGR rasters with 4-byte row alignment. AVI frames are full frames
    * (no inter-frame deltas in these codecs), so unlike GIF there is no
    * compositing pass; requested indexes past the last frame clamp to it,
    * matching the GIF path's deterministic tail sampling. Frames return
    * PNG-encoded, same contract as the GIF path.
    */
  private[operators] object AviDecoder {
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
        ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
    private def i32(b: Array[Byte], off: Int): Int = u32(b, off).toInt
    private def u16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
    private def fourccOf(v: Int): String = new String(Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte),
      java.nio.charset.StandardCharsets.US_ASCII)

    def isAvi(b: Array[Byte]): Boolean =
      b.length >= 12 && fourcc(b, 0) == "RIFF" && fourcc(b, 8) == "AVI "

    private final case class Fmt(width: Int, height: Int, bitCount: Int,
        compression: Int)

    /** (video format, frame chunk [start, end) ranges in stream order). */
    private def scan(b: Array[Byte]): (Fmt, Vector[(Int, Int)]) = {
      var streamIdx = -1 // counts 'strl' lists; stream N's chunks are "NNd?"
      var videoStream = -1
      var awaitingVidsFmt = false
      var fmt: Fmt = null
      val frames = Vector.newBuilder[(Int, Int)]

      def walk(start: Int, end: Int): Unit = {
        var off = start
        while (off + 8 <= end) {
          val id = fourcc(b, off)
          val size = u32(b, off + 4).toInt
          val dataStart = off + 8
          val dataEnd = math.min(end, dataStart + size)
          if (id == "LIST" && dataEnd >= dataStart + 4) {
            if (fourcc(b, dataStart) == "strl") {
              streamIdx += 1; awaitingVidsFmt = false
            }
            walk(dataStart + 4, dataEnd)
          } else if (id == "strh") {
            if (dataEnd >= dataStart + 4 && fourcc(b, dataStart) == "vids" &&
                videoStream < 0) {
              videoStream = streamIdx
              awaitingVidsFmt = true
            }
          } else if (id == "strf") {
            if (awaitingVidsFmt && fmt == null && dataEnd >= dataStart + 20) {
              fmt = Fmt(i32(b, dataStart + 4), i32(b, dataStart + 8),
                u16(b, dataStart + 14), i32(b, dataStart + 16))
              awaitingVidsFmt = false
            }
          } else if (videoStream >= 0 && id.startsWith(f"$videoStream%02d") &&
              (id.endsWith("db") || id.endsWith("dc"))) {
            frames += ((dataStart, dataEnd))
          }
          off = dataStart + size + (size & 1) // chunks pad to even length
        }
      }
      walk(12, b.length)
      require(fmt != null, "AVI payload has no video stream format (strf)")
      (fmt, frames.result())
    }

    /** Raw BI_RGB DIB: bottom-up (top-down when biHeight < 0) BGR rows,
      * each padded to a 4-byte boundary; 24- and 32-bit depths.
      */
    private def decodeDib(b: Array[Byte], start: Int, fmt: Fmt):
        java.awt.image.BufferedImage = {
      val w = fmt.width
      val h = math.abs(fmt.height)
      val bottomUp = fmt.height > 0
      require(fmt.bitCount == 24 || fmt.bitCount == 32,
        s"unsupported DIB depth ${fmt.bitCount} (24/32-bit BI_RGB decode)")
      val px = fmt.bitCount / 8
      val stride = ((w * px + 3) / 4) * 4
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var sy = 0
      while (sy < h) {
        val y = if (bottomUp) h - 1 - sy else sy
        var x = 0
        while (x < w) {
          val o = start + sy * stride + x * px
          img.setRGB(x, y,
            ((b(o + 2) & 0xFF) << 16) | ((b(o + 1) & 0xFF) << 8) | (b(o) & 0xFF))
          x += 1
        }
        sy += 1
      }
      img
    }

    def frames(b: Array[Byte], frameIdxs: Array[Int]): Array[Array[Byte]] = {
      val (fmt, chunks) = scan(b)
      require(chunks.nonEmpty, "AVI payload has no video frames")
      val last = chunks.length - 1
      def clamp(i: Int): Int = math.max(0, math.min(i, last))
      val decoded = frameIdxs.map(clamp).distinct.map { i =>
        val (s, e) = chunks(i)
        val img =
          if (fmt.compression == 0) decodeDib(b, s, fmt)
          else if (fourccOf(fmt.compression) == "MJPG") {
            val im = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(b, s, e - s))
            require(im != null, s"AVI MJPG frame $i did not decode")
            im
          } else throw new IllegalArgumentException(
            s"unsupported AVI video codec '${fourccOf(fmt.compression)}' " +
              "(MJPG and BI_RGB DIB decode pure-JVM)")
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        i -> bos.toByteArray
      }.toMap
      frameIdxs.map(i => decoded(clamp(i)))
    }
  }

  // ------------------------------------------------------------- audio

  /** Decoded-audio summary: what the `meta` struct stores for audio rows. */
  final case class AudioInfo(sampleRate: Int, channels: Int, frames: Long,
      durationMs: Long)

  /** Audio codec boundary (separate from [[Codec]] — the modalities share
    * plumbing, not signatures). Implementations must be deterministic.
    */
  trait AudioCodec extends Serializable {
    def info(bytes: Array[Byte]): AudioInfo
    /** Mono-mixed samples normalized to [-1, 1]. */
    def pcm(bytes: Array[Byte]): Array[Float]
    def audioFeatures(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** Real audio codec on the JDK's built-in javax.sound.sampled — decodes
    * WAV/AIFF/AU PCM payloads (8/16/24/32-bit, any channel count; mixed to
    * mono). No external dependency, same spirit as [[ImageIOCodec]].
    * Compressed formats (MP3/OGG/AAC) are outside the JDK — those payloads
    * throw, and a real deployment swaps in a wider decoder behind the same
    * trait.
    *
    * Features: the first `dim/2` cells are per-window RMS energy, the next
    * `dim/2` per-window zero-crossing rate — the classical envelope+pitch
    * proxy shape an audio-embedding slot expects, deterministic.
    */
  object JavaSoundCodec extends AudioCodec {
    private def stream(bytes: Array[Byte]) =
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))

    def info(bytes: Array[Byte]): AudioInfo = {
      val in = stream(bytes)
      try {
        val f = in.getFormat
        val frames = in.getFrameLength
        AudioInfo(f.getSampleRate.toInt, f.getChannels, frames,
          if (f.getFrameRate > 0) (frames * 1000L / f.getFrameRate.toLong)
          else 0L)
      } finally in.close()
    }

    def pcm(bytes: Array[Byte]): Array[Float] = {
      val in = stream(bytes)
      try {
        val f = in.getFormat
        val enc = f.getEncoding
        import javax.sound.sampled.AudioFormat.Encoding._
        require(enc == PCM_SIGNED || enc == PCM_UNSIGNED,
          s"unsupported encoding $enc — only PCM WAV/AIFF/AU decode in-JDK")
        val bits = f.getSampleSizeInBits
        require(bits % 8 == 0 && bits <= 32, s"unsupported sample size $bits")
        val bytesPer = bits / 8
        val ch = f.getChannels
        val raw = in.readAllBytes()
        val nFrames = raw.length / (bytesPer * ch)
        val out = new Array[Float](nFrames)
        val big = f.isBigEndian
        val half = 1L << (bits - 1)
        var i = 0
        while (i < nFrames) {
          var acc = 0.0
          var c = 0
          while (c < ch) {
            val base = (i * ch + c) * bytesPer
            var v = 0L
            var b = 0
            while (b < bytesPer) {
              val by = raw(base + (if (big) b else bytesPer - 1 - b)) & 0xFFL
              v = (v << 8) | by
              b += 1
            }
            // sign-extend signed PCM; shift unsigned to signed range
            val s =
              if (enc == PCM_SIGNED) { if (v >= half) v - (half << 1) else v }
              else v - half
            acc += s.toDouble / half
            c += 1
          }
          out(i) = (acc / ch).toFloat
          i += 1
        }
        out
      } finally in.close()
    }

    def audioFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
      val samples = pcm(bytes)
      val out = new Array[Float](dim)
      val nWin = math.max(1, dim / 2)
      val n = samples.length
      var w = 0
      while (w < nWin) {
        val s0 = (w.toLong * n / nWin).toInt
        val s1 = math.max(s0 + 1, ((w + 1).toLong * n / nWin).toInt)
        var energy = 0.0
        var crossings = 0
        var i = s0
        while (i < s1 && i < n) {
          energy += samples(i).toDouble * samples(i)
          if (i > s0 && (samples(i) >= 0) != (samples(i - 1) >= 0)) crossings += 1
          i += 1
        }
        val len = math.max(1, math.min(s1, n) - s0)
        out(w) = math.sqrt(energy / len).toFloat
        if (nWin + w < dim) out(nWin + w) = crossings.toFloat / len
        w += 1
      }
      out
    }
  }

  /** Feature extraction: binary → `array<float>` embedding column. Runs as a
    * deterministic UDF over the payload — one pass, no shuffle; the scan's
    * partitioning carries through, so this parallelizes exactly like the
    * underlying file layout.
    */
  def imageFeatureCol(bytes: Column, dim: Int, codec: Codec = ImageIOCodec): Column = {
    val f = udf((b: Array[Byte]) =>
      if (b == null) null else codec.imageFeatures(b, dim))
    f(bytes)
  }

  /** Audio feature extraction: binary → `array<float>` (RMS envelope +
    * zero-crossing rate). Same shuffle-free shape as [[imageFeatureCol]].
    */
  def audioFeatureCol(bytes: Column, dim: Int,
      codec: AudioCodec = JavaSoundCodec): Column = {
    val f = udf((b: Array[Byte]) =>
      if (b == null) null else codec.audioFeatures(b, dim))
    f(bytes)
  }

  /** Audio metadata: binary → struct(sample_rate, channels, frames,
    * duration_ms) — fills the audio half of [[mediaSchema]]'s meta struct.
    */
  def audioInfoCol(bytes: Column,
      codec: AudioCodec = JavaSoundCodec): Column = {
    val f = udf((b: Array[Byte]) => if (b == null) null else codec.info(b))
    f(bytes)
  }

  /** Resize: payload → payload, metadata struct updated in the same pass. */
  def resize(df: DataFrame, w: Int, h: Int, codec: Codec = ImageIOCodec): DataFrame = {
    val f = udf((b: Array[Byte]) => if (b == null) null else codec.resize(b, w, h))
    df.withColumn("bytes", f(col("bytes")))
      .withColumn("meta", col("meta")
        .withField("width", lit(w)).withField("height", lit(h)))
  }

  /** Frame sampling: one row per sampled frame (`frame_idx`, `frame_bytes`).
    * posexplode keeps it a Generate — no shuffle; downstream per-frame work
    * inherits the scan partitioning × frames-per-video fan-out.
    */
  def sampleFrames(df: DataFrame, nFrames: Int, codec: Codec = ImageIOCodec): DataFrame = {
    val f = udf((b: Array[Byte]) =>
      if (b == null) Array.empty[Array[Byte]]
      else codec.videoFrames(b, Array.tabulate(nFrames)(identity)))
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
