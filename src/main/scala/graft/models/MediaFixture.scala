package graft.models

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checkable multimodal fixture (d20): REAL codec decodes whose
  * feature arithmetic is exactly replayable in SQL.
  *
  *  - images: solid-color 16×16 PNGs decoded by
  *    [[graft.operators.Multimodal.ImageIOCodec]] with dim = 256 (one
  *    pixel per luminance-grid cell, so no accumulation rounding): the
  *    feature is exactly `float((0.299 r + 0.587 g + 0.114 b)/255)`.
  *  - audio: constant-sample 16-bit mono WAVs decoded by
  *    [[graft.operators.Multimodal.JavaSoundCodec]]: every partial sum in
  *    the RMS loop is an exact dyadic rational (s²·n ≤ 2^40 < 2^53), so
  *    RMS is exactly `float(|s|/32768)` and ZCR of a constant signal is
  *    exactly 0.
  *
  * The (r,g,b) / sample parameters are the single source: the Spark side
  * encodes real PNG/WAV payloads from them and runs the real decoders;
  * the DuckDB oracle computes the same closed forms from the same VALUES.
  */
object MediaFixture {

  /** (media_id, r, g, b) for the image rows. */
  val imageParams: Seq[(Long, Int, Int, Int)] =
    (0 until 40).map(i => (i.toLong, (i * 37) % 256, (i * 59) % 256, (i * 83) % 256))

  /** (media_id, constant 16-bit sample) for the audio rows. */
  val audioParams: Seq[(Long, Int)] =
    (0 until 24).map(i => (100L + i, i * 1000 - 12000))

  private[graft] def solidPng(r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (r << 16) | (g << 8) | b
    var y = 0
    while (y < 16) { var x = 0; while (x < 16) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 800 constant samples, 8 kHz 16-bit mono little-endian WAV. */
  private[graft] def constWav(sample: Int): Array[Byte] = {
    import javax.sound.sampled._
    val n = 800
    val raw = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      raw(2 * i) = (sample & 0xFF).toByte
      raw(2 * i + 1) = ((sample >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The d20 frame: every payload really encoded, really decoded, one
    * feature value per media row (plus audio ZCR).
    */
  def features(s: SparkSession): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal
    val imgs = imageParams.toDF("media_id", "r", "g", "b")
      .withColumn("bytes",
        udf((r: Int, g: Int, b: Int) => solidPng(r, g, b))
          .apply(col("r"), col("g"), col("b")))
      .withColumn("feats",
        Multimodal.imageFeatureCol(col("bytes"), 256, Multimodal.ImageIOCodec))
      .select(col("media_id"), lit("image").as("modality"),
        element_at(col("feats"), 1).as("feat"),
        lit(0.0f).as("zcr"))
    val auds = audioParams.toDF("media_id", "s")
      .withColumn("bytes", udf((s: Int) => constWav(s)).apply(col("s")))
      .withColumn("feats", Multimodal.audioFeatureCol(col("bytes"), 2))
      .select(col("media_id"), lit("audio").as("modality"),
        element_at(col("feats"), 1).as("feat"),
        element_at(col("feats"), 2).as("zcr"))
    imgs.unionByName(auds)
  }

  // ------------------------------------------------------- video (d23)

  /** (media_id, n_frames) for the video rows — several shorter than the
    * 4-frame sampling below, so index clamping is exercised under oracle.
    */
  val videoParams: Seq[(Long, Int)] =
    (0 until 20).map(i => (200L + i, 2 + (i % 4)))

  /** Frame f of video id is a solid (r, g, b) — the closed form both the
    * Spark fixture and the oracle VALUES compute.
    */
  def videoRgb(id: Long, f: Int): (Int, Int, Int) =
    (((id * 29 + f * 17) % 256).toInt, ((id * 43 + f * 7) % 256).toInt,
      ((id * 11 + f * 53) % 256).toInt)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def cc(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte]
    cc(id) ++ le32(data.length.toLong) ++ data ++ pad
  }
  private def list(listType: String, data: Array[Byte]): Array[Byte] =
    chunk("LIST", cc(listType) ++ data)

  /** Solid-color 24-bit BI_RGB DIB raster: bottom-up BGR rows padded to 4
    * bytes (trivially uniform for a solid frame).
    */
  private def dibFrame(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = y * stride + x * 3
        out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Minimal valid AVI container around pre-encoded frame chunks: RIFF →
    * hdrl (avih + one strl with strh/strf) → movi. `compression` 0 writes
    * '00db' BI_RGB chunks; fourcc 'MJPG' writes '00dc' JPEG chunks.
    */
  private[graft] def buildAvi(w: Int, h: Int, frameChunks: Seq[Array[Byte]],
      handler: String, compression: Int): Array[Byte] = {
    val n = frameChunks.length
    val avih = le32(40000L) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++
      le32(n.toLong) ++ le32(0L) ++ le32(1L) ++ le32(0L) ++
      le32(w.toLong) ++ le32(h.toLong) ++ Array.fill(16)(0.toByte)
    val strh = cc("vids") ++ cc(handler) ++ le32(0L) ++ le32(0L) ++
      le32(0L) ++ le32(1L) ++ le32(25L) ++ le32(0L) ++ le32(n.toLong) ++
      le32(0L) ++ le32(0L) ++ le32(0L) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h)
    val stride = ((w * 3 + 3) / 4) * 4
    val strf = le32(40L) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++
      le16(24) ++ le32(compression.toLong) ++ le32((stride * h).toLong) ++
      le32(0L) ++ le32(0L) ++ le32(0L) ++ le32(0L)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val frameId = if (compression == 0) "00db" else "00dc"
    val movi = list("movi", frameChunks.flatMap(f => chunk(frameId, f)).toArray)
    chunk("RIFF", cc("AVI ") ++ hdrl ++ movi)
  }

  /** The 16×16 solid-DIB AVI payload for video `id`. */
  private[graft] def solidAvi(id: Long, nFrames: Int): Array[Byte] =
    buildAvi(16, 16,
      (0 until nFrames).map { f =>
        val (r, g, b) = videoRgb(id, f)
        dibFrame(16, 16, r, g, b)
      },
      handler = "DIB ", compression = 0)

  /** Frames sampled per video by d23 (more than some videos have). */
  val videoSampleFrames: Int = 4

  /** The d23 frame: real AVI containers (built by the fixture's own RIFF
    * writer), really parsed and decoded by [[graft.operators.Multimodal
    * .AviDecoder]] via sampleFrames, one luminance feature per sampled
    * frame. MJPEG is exercised raster-exactly in MultimodalSpec (a lossy
    * JPEG round-trip has no closed form for an oracle; BI_RGB does).
    */
  def videoFeatures(s: SparkSession): DataFrame = {
    import s.implicits._
    import graft.operators.Multimodal
    val vids = videoParams.toDF("media_id", "n_frames")
      .withColumn("bytes",
        udf((id: Long, n: Int) => solidAvi(id, n))
          .apply(col("media_id"), col("n_frames")))
    Multimodal.sampleFrames(vids, videoSampleFrames, Multimodal.ImageIOCodec)
      .withColumn("feats",
        Multimodal.imageFeatureCol(col("frame_bytes"), 256, Multimodal.ImageIOCodec))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        element_at(col("feats"), 1).as("feat"))
  }

  def videoOracleSql: String = {
    val rows = videoParams.flatMap { case (id, n) =>
      (0 until videoSampleFrames).map { f =>
        val (r, g, b) = videoRgb(id, math.min(f, n - 1)) // clamped sampling
        s"($id, $f, $r, $g, $b)"
      }
    }.mkString(",\n    ")
    s"""SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |  CAST((0.299 * r + 0.587 * g + 0.114 * b) / 255.0 AS FLOAT) AS feat
       |FROM (VALUES
       |    $rows) AS t(media_id, frame_idx, r, g, b)""".stripMargin
  }

  // ------------------------------------------------------- oracle SQL

  def oracleSql: String = {
    val img = imageParams.map { case (id, r, g, b) => s"($id, $r, $g, $b)" }
      .mkString(",\n    ")
    val aud = audioParams.map { case (id, sm) => s"($id, $sm)" }
      .mkString(",\n    ")
    s"""SELECT media_id, 'image' AS modality,
       |  CAST((0.299 * r + 0.587 * g + 0.114 * b) / 255.0 AS FLOAT) AS feat,
       |  CAST(0.0 AS FLOAT) AS zcr
       |FROM (VALUES
       |    $img) AS t(media_id, r, g, b)
       |UNION ALL
       |SELECT media_id, 'audio',
       |  CAST(CAST(abs(s) AS DOUBLE) / 32768.0 AS FLOAT),
       |  CAST(0.0 AS FLOAT)
       |FROM (VALUES
       |    $aud) AS t(media_id, s)""".stripMargin
  }
}
