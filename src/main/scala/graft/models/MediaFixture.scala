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
