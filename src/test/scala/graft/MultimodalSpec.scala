package graft

import graft.operators.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  def mediaDf = {
    val rows = Seq(
      Row(1L, "image", "image/png", Array.fill[Byte](256)(7), Row(64, 64, null, null)),
      Row(2L, "image", "image/png", Array.fill[Byte](64)(9), Row(16, 16, null, null)),
      Row(3L, "video", "video/mp4", Array.tabulate[Byte](160)(_.toByte), Row(null, null, 5000L, null)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.mediaSchema)
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
      .select(length(col("bytes")), col("meta.width"), col("meta.height")).head()
    assert(r.getInt(0) == 16) // 32*32/64 stub size
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
    val df = Multimodal.repartitionByBytes(mediaDf, targetBytesPerPartition = 200L)
    assert(df.rdd.getNumPartitions == 2) // 480 payload bytes / 200 → 2
  }
}
