package graft

import graft.operators.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Real solid-color PNG payload. */
  def solidPngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // every payload REAL and decodable — the codecs have no fake fallback
  def mediaDf = {
    val rows = Seq(
      Row(1L, "image", "image/png", solidPngBytes(64, 64, 0x808080), Row(64, 64, null, null)),
      Row(2L, "image", "image/png", solidPngBytes(16, 16, 0x112233), Row(16, 16, null, null)),
      Row(3L, "video", "video/x-msvideo",
        graft.models.MediaFixture.solidAvi(1L, 4), Row(null, null, 160L, null)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
  }

  /** Real PNG payload: left half black, right half white. */
  def halfPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIOCodec: real PNG decode, luminance features see the halves") {
    val png = halfPng(64, 64)
    val df = Seq(Tuple1(png)).toDF("bytes")
    val feat = df.select(Multimodal.imageFeatureCol(col("bytes"), 16,
      Multimodal.ImageIOCodec)).as[Seq[Float]].head()
    assert(feat.length == 16)
    // 4x4 grid row-major: columns 0-1 black (≈0), columns 2-3 white (≈1)
    for (row <- 0 until 4) {
      assert(feat(row * 4) < 0.05f && feat(row * 4 + 1) < 0.05f)
      assert(feat(row * 4 + 2) > 0.95f && feat(row * 4 + 3) > 0.95f)
    }
  }

  test("ImageIOCodec: resize re-encodes a real decodable PNG at target size") {
    val out = Multimodal.ImageIOCodec.resize(halfPng(64, 32), 16, 8)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(back.getWidth == 16 && back.getHeight == 8)
    // still half black / half white after bilinear downscale
    val feats = Multimodal.ImageIOCodec.imageFeatures(out, 4)
    assert(feats(0) < 0.2f && feats(1) > 0.8f)
    // deterministic re-encode
    assert(out.sameElements(Multimodal.ImageIOCodec.resize(halfPng(64, 32), 16, 8)))
  }

  test("ImageIOCodec: undecodable payload raises a clear error") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIOCodec.imageFeatures(Array.fill[Byte](32)(3), 4)
    }
    assert(e.getMessage.contains("not a decodable image"))
  }

  test("image features: deterministic, right dimension, null-safe") {
    val feats = mediaDf.filter(col("modality") === "image")
      .withColumn("feat", Multimodal.imageFeatureCol(col("bytes"), 8))
      .select("media_id", "feat").as[(Long, Seq[Float])].collect().toMap
    assert(feats(1L).length == 8)
    // deterministic: recompute equals
    val again = mediaDf.filter(col("media_id") === 1L)
      .select(Multimodal.imageFeatureCol(col("bytes"), 8)).as[Seq[Float]].head()
    assert(feats(1L) == again)
    assert(feats(1L) != feats(2L)) // different payloads → different features
  }

  test("resize updates payload and metadata struct in one pass") {
    val r = Multimodal.resize(mediaDf.filter(col("media_id") === 1L), 32, 32)
      .select(col("bytes"), col("meta.width"), col("meta.height")).head()
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0)))
    assert(back.getWidth == 32 && back.getHeight == 32) // really re-encoded
    assert(r.getInt(1) == 32 && r.getInt(2) == 32)
  }

  test("frame sampling explodes to n rows per video") {
    val frames = Multimodal.sampleFrames(mediaDf.filter(col("modality") === "video"), 4)
    assert(frames.count() == 4)
    val idx = frames.select("frame_idx").as[Int].collect().sorted
    assert(idx.sameElements(Array(0, 1, 2, 3)))
    assert(frames.filter(length(col("frame_bytes")) === 0).count() == 0)
  }

  test("mapBatched: codec sees fixed-size batches, rows round-trip") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      StructField("media_id", LongType), StructField("batch_len", IntegerType)))
    val df = spark.range(10).toDF("media_id")
    val got = Multimodal.mapBatched(df, batchSize = 4, outSchema) { batch =>
      assert(batch.length <= 4)
      batch.map(r => Row(r.getLong(0), batch.length))
    }
    assert(got.count() == 10)
    // every batch the codec saw was bounded by batchSize
    assert(got.agg(max(col("batch_len"))).head().getInt(0) <= 4)
  }

  test("byte-budget repartitioning sizes partitions by payload, not rows") {
    val totalBytes = mediaDf.agg(sum(length(col("bytes")))).head().getLong(0)
    val df = Multimodal.repartitionByBytes(mediaDf, targetBytesPerPartition = 200L)
    assert(df.rdd.getNumPartitions == math.max(1, (totalBytes / 200L).toInt))
    assert(df.rdd.getNumPartitions > 1) // payloads exceed one budget
  }

  // ------------------------------------------------------- real audio codec

  /** Synthesize a PCM WAV payload: `freq` Hz sine, 16-bit signed stereo or
    * 8-bit unsigned mono, via the same JDK API users would write with.
    */
  private def wavBytes(freq: Double, seconds: Double, sampleRate: Int,
      bits: Int, channels: Int, amplitude: Double): Array[Byte] = {
    import javax.sound.sampled._
    val n = (seconds * sampleRate).toInt
    val bytesPer = bits / 8
    val raw = new Array[Byte](n * bytesPer * channels)
    var i = 0
    while (i < n) {
      val v = amplitude * math.sin(2 * math.Pi * freq * i / sampleRate)
      var c = 0
      while (c < channels) {
        val base = (i * channels + c) * bytesPer
        if (bits == 16) {
          val s = (v * 32767).toInt
          raw(base) = (s & 0xFF).toByte          // little-endian
          raw(base + 1) = ((s >> 8) & 0xFF).toByte
        } else {
          raw(base) = ((v * 127).toInt + 128).toByte // 8-bit unsigned
        }
        c += 1
      }
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, bits, channels,
      /*signed=*/ bits == 16, /*bigEndian=*/ false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("JavaSoundCodec decodes WAV: info, PCM mixdown, sine RMS") {
    val wav = wavBytes(freq = 440, seconds = 0.5, sampleRate = 8000,
      bits = 16, channels = 2, amplitude = 0.5)
    val info = Multimodal.JavaSoundCodec.info(wav)
    assert(info.sampleRate == 8000 && info.channels == 2)
    assert(info.frames == 4000 && info.durationMs == 500)
    val pcm = Multimodal.JavaSoundCodec.pcm(wav)
    assert(pcm.length == 4000)
    val rms = math.sqrt(pcm.map(s => s.toDouble * s).sum / pcm.length)
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 0.01, s"rms=$rms")
  }

  test("JavaSoundCodec handles 8-bit unsigned mono and rejects non-audio") {
    val wav = wavBytes(freq = 100, seconds = 0.25, sampleRate = 4000,
      bits = 8, channels = 1, amplitude = 0.9)
    val pcm = Multimodal.JavaSoundCodec.pcm(wav)
    assert(pcm.length == 1000)
    assert(math.abs(pcm.max - 0.9) < 0.03 && math.abs(pcm.min + 0.9) < 0.03)
    intercept[Exception] {
      Multimodal.JavaSoundCodec.info("not a wav".getBytes)
    }
  }

  test("audio features: louder signal → higher RMS cells; ZCR tracks freq") {
    val quiet = wavBytes(440, 0.5, 8000, 16, 1, amplitude = 0.1)
    val loud = wavBytes(440, 0.5, 8000, 16, 1, amplitude = 0.8)
    val fq = Multimodal.JavaSoundCodec.audioFeatures(quiet, 8)
    val fl = Multimodal.JavaSoundCodec.audioFeatures(loud, 8)
    (0 until 4).foreach(i => assert(fl(i) > fq(i))) // RMS half
    // ZCR half: 440 Hz at 8 kHz crosses ~2*440/8000 = 0.11 per sample
    (4 until 8).foreach(i => assert(math.abs(fq(i) - 0.11f) < 0.02f))
    // deterministic
    assert(fq.sameElements(Multimodal.JavaSoundCodec.audioFeatures(quiet, 8)))
  }

  test("audio columns run through the DataFrame plumbing") {
    val wav = wavBytes(440, 0.25, 8000, 16, 1, amplitude = 0.5)
    val df = Seq((1L, wav), (2L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "bytes")
    val got = df.select(col("media_id"),
        Multimodal.audioFeatureCol(col("bytes"), 4).as("feat"),
        Multimodal.audioInfoCol(col("bytes")).as("ai"))
      .orderBy("media_id").collect()
    assert(got(0).getAs[scala.collection.Seq[Float]]("feat").length == 4)
    assert(got(0).getAs[org.apache.spark.sql.Row]("ai").getInt(0) == 8000)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
  }

  // ------------------------------------------------------------- GIF video

  def solidImg(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  /** Animated GIF from (raster, xOffset, yOffset, disposalMethod) frames —
    * written with the JDK's own GIF writer so the reader-side compositing
    * is exercised against a conforming container.
    */
  def animatedGif(
      frames: Seq[(java.awt.image.BufferedImage, Int, Int, String)]): Array[Byte] = {
    import javax.imageio.metadata.IIOMetadataNode
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { case (img, x, y, disposal) =>
      val itype = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
      val md = writer.getDefaultImageMetadata(itype, writer.getDefaultWriteParam)
      val fmt = "javax_imageio_gif_image_1.0"
      val root = md.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      def child(name: String): IIOMetadataNode = {
        val kids = root.getChildNodes
        (0 until kids.getLength).map(kids.item).find(_.getNodeName == name)
          .map(_.asInstanceOf[IIOMetadataNode])
          .getOrElse { val n = new IIOMetadataNode(name); root.appendChild(n); n }
      }
      val gce = child("GraphicControlExtension")
      gce.setAttribute("disposalMethod", disposal)
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", "10")
      gce.setAttribute("transparentColorIndex", "0")
      val desc = child("ImageDescriptor")
      desc.setAttribute("imageLeftPosition", x.toString)
      desc.setAttribute("imageTopPosition", y.toString)
      desc.setAttribute("imageWidth", img.getWidth.toString)
      desc.setAttribute("imageHeight", img.getHeight.toString)
      desc.setAttribute("interlaceFlag", "FALSE")
      md.setFromTree(fmt, root)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, md), writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("ImageIOCodec: GIF frames composite deltas at their offsets") {
    // f0: full 32x32 black; f1: 16x16 white delta at (8,8)
    val gif = animatedGif(Seq(
      (solidImg(32, 32, 0x000000), 0, 0, "none"),
      (solidImg(16, 16, 0xFFFFFF), 8, 8, "none")))
    val fs = Multimodal.ImageIOCodec.videoFrames(gif, Array(0, 1, 5))
    // PNG-encoded full frames at logical-screen size
    fs.foreach { f =>
      assert((f(0) & 0xFF) == 0x89 && f(1) == 'P' && f(2) == 'N' && f(3) == 'G')
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(f))
      assert(img.getWidth == 32 && img.getHeight == 32)
    }
    val feat0 = Multimodal.ImageIOCodec.imageFeatures(fs(0), 16)
    assert(feat0.forall(_ < 0.05f)) // frame 0: all black
    // frame 1: white delta covers grid cells (1..2, 1..2); corners stay black
    val feat1 = Multimodal.ImageIOCodec.imageFeatures(fs(1), 16)
    assert(feat1(0) < 0.05f && feat1(3) < 0.05f && feat1(15) < 0.05f)
    assert(feat1(5) > 0.95f && feat1(6) > 0.95f && feat1(9) > 0.95f)
    // index past the last frame clamps to the final composited frame
    assert(fs(2).sameElements(fs(1)))
    // single sequential pass agrees with per-frame calls
    assert(Multimodal.ImageIOCodec.videoFrame(gif, 1).sameElements(fs(1)))
  }

  test("ImageIOCodec: restoreToBackgroundColor disposal clears the delta") {
    val gif = animatedGif(Seq(
      (solidImg(32, 32, 0x000000), 0, 0, "none"),
      (solidImg(16, 16, 0xFFFFFF), 8, 8, "restoreToBackgroundColor"),
      (solidImg(8, 8, 0x808080), 0, 0, "none")))
    val fs = Multimodal.ImageIOCodec.videoFrames(gif, Array(1, 2))
    val f1 = Multimodal.ImageIOCodec.imageFeatures(fs(0), 16)
    assert(f1(5) > 0.95f) // delta visible on frame 1
    val f2 = Multimodal.ImageIOCodec.imageFeatures(fs(1), 16)
    assert(f2(5) < 0.05f) // cleared before frame 2 composited
    assert(f2(0) > 0.3f && f2(0) < 0.7f) // gray top-left delta landed
  }

  test("ImageIOCodec: restoreToPrevious disposal reverts the covered rect") {
    // white base; black delta with restoreToPrevious; then a no-op corner
    // delta — after frame 1 the center must be WHITE again, not black
    val gif = animatedGif(Seq(
      (solidImg(32, 32, 0xFFFFFF), 0, 0, "none"),
      (solidImg(16, 16, 0x000000), 8, 8, "restoreToPrevious"),
      (solidImg(4, 4, 0x000000), 0, 0, "none")))
    val fs = Multimodal.ImageIOCodec.videoFrames(gif, Array(1, 2))
    val f1 = Multimodal.ImageIOCodec.imageFeatures(fs(0), 16)
    assert(f1(5) < 0.05f) // black delta visible while frame 1 displays
    val f2 = Multimodal.ImageIOCodec.imageFeatures(fs(1), 16)
    assert(f2(5) > 0.95f) // center reverted to the pre-frame white
  }

  test("GIF and AVI payloads flow through sampleFrames as real PNG frames") {
    val gif = animatedGif(Seq(
      (solidImg(16, 16, 0x000000), 0, 0, "none"),
      (solidImg(16, 16, 0xFFFFFF), 0, 0, "none")))
    val avi = graft.models.MediaFixture.solidAvi(7L, 2)
    val rows = Seq(
      Row(10L, "video", "image/gif", gif, Row(null, null, 200L, null)),
      Row(11L, "video", "video/x-msvideo", avi, Row(null, null, 80L, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
    val got = Multimodal.sampleFrames(df, 2, Multimodal.ImageIOCodec)
      .orderBy("media_id", "frame_idx").collect()
    assert(got.length == 4)
    val frames = got.map(_.getAs[Array[Byte]]("frame_bytes"))
    assert(frames.forall(f => (f(0) & 0xFF) == 0x89)) // ALL real PNG frames
    assert(!frames(0).sameElements(frames(1)))        // gif: black vs white
    assert(!frames(2).sameElements(frames(3)))        // avi: per-frame colors
  }

  test("AviDecoder: BI_RGB frames decode to the exact authored rasters") {
    val avi = graft.models.MediaFixture.solidAvi(3L, 3)
    // sample PAST the last frame: index clamps to it (deterministic tail)
    val fs = Multimodal.ImageIOCodec.videoFrames(avi, Array(0, 1, 2, 5))
    assert(fs(3).sameElements(fs(2))) // clamped
    (0 until 3).foreach { f =>
      val (r, g, b) = graft.models.MediaFixture.videoRgb(3L, f)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(fs(f)))
      assert(img.getWidth == 16 && img.getHeight == 16)
      // every pixel is exactly the authored solid color — the raster
      // survives DIB encode → AviDecoder decode → PNG byte-for-byte
      assert((img.getRGB(0, 0) & 0xFFFFFF) == ((r << 16) | (g << 8) | b))
      assert((img.getRGB(15, 15) & 0xFFFFFF) == ((r << 16) | (g << 8) | b))
    }
  }

  test("AviDecoder: MJPEG frames equal a direct decode of the same JPEG") {
    // JPEG is lossy, so no closed-form pixels — but container parsing is
    // exact: the frame must decode to the SAME raster as ImageIO reading
    // the embedded JPEG bytes directly
    def jpeg(rgb: Int): Array[Byte] = {
      val img = solidImg(16, 16, rgb)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val jpegs = Seq(jpeg(0x336699), jpeg(0xCC8833))
    val avi = graft.models.MediaFixture.buildAvi(16, 16, jpegs,
      handler = "MJPG", compression =
        ('M'.toInt) | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24))
    val fs = Multimodal.ImageIOCodec.videoFrames(avi, Array(0, 1))
    jpegs.zip(fs).foreach { case (src, png) =>
      val direct = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(src))
      val viaAvi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(viaAvi.getWidth == direct.getWidth && viaAvi.getHeight == direct.getHeight)
      for (y <- 0 until direct.getHeight; x <- 0 until direct.getWidth)
        assert((viaAvi.getRGB(x, y) & 0xFFFFFF) == (direct.getRGB(x, y) & 0xFFFFFF))
    }
  }

  test("unsupported video containers throw instead of producing fake frames") {
    val mp4ish = Array.tabulate[Byte](160)(_.toByte)
    val e = intercept[IllegalArgumentException] {
      Multimodal.ImageIOCodec.videoFrames(mp4ish, Array(0))
    }
    assert(e.getMessage.contains("no pure-JVM decoder"))
  }
}
