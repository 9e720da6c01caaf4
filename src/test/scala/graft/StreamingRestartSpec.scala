package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the claim q83 makes in prose: checkpointed source progress
  * survives a query STOP and RESTART, and the foreachBatch upsert
  * converges to the same table a batch computation produces — the
  * operational exactly-once story (file source offsets in the
  * checkpoint + idempotent per-key merge) rather than a single
  * uninterrupted run.
  */
class StreamingRestartSpec extends SparkSpec {
  import spark.implicits._

  test("checkpointed upsert resumes after stop/restart and equals the batch answer") {
    val root = java.nio.file.Files.createTempDirectory("graft_restart_")
    try {
      val in = root.resolve("in"); java.nio.file.Files.createDirectory(in)
      val wh = root.resolve("wh").toString
      val ckpt = root.resolve("ckpt").toString
      val writer = new graft.sources.TableWriter(wh)

      // 4 event slices; per-user latest (ts, event_id) wins globally
      val all = (1 to 400).map { i =>
        (i.toLong, new java.sql.Timestamp(1700000000000L + (i % 97) * 1000L),
          (i % 7).toLong, s"v$i")
      }
      val slices = all.grouped(100).toSeq
      def writeSlice(s: Seq[(Long, java.sql.Timestamp, Long, String)], n: Int): Unit =
        s.toDF("event_id", "ts", "user_id", "v").coalesce(1)
          .write.parquet(in.resolve(s"s$n").toString)

      val schema = slices.head.toDF("event_id", "ts", "user_id", "v").schema
      val latestW = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val tableP = new java.io.File(writer.path("latest"))

      def runOnce(): Unit = {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(s"$in/s*")
          .writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val inBatch = batch.withColumn("__rn", row_number().over(latestW))
              .filter(col("__rn") === 1).drop("__rn")
            val resolved = if (!tableP.exists) inBatch
            else writer.read(spark, "latest").drop("__bucket")
              .join(inBatch.select("user_id"), Seq("user_id"), "left_semi")
              .unionByName(inBatch)
              .withColumn("__rn", row_number().over(latestW))
              .filter(col("__rn") === 1).drop("__rn")
            writer.mergeByKey(spark, "latest", resolved, "user_id")
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
      }

      // phase 1: two slices, then STOP
      writeSlice(slices(0), 0); writeSlice(slices(1), 1)
      runOnce()
      val afterPhase1 = writer.read(spark, "latest").count()
      assert(afterPhase1 > 0)

      // phase 2: two more slices land while the query is down; RESTART
      // resumes from the checkpoint (slices 0-1 are not reprocessed —
      // the merge is idempotent anyway, but offsets must advance)
      writeSlice(slices(2), 2); writeSlice(slices(3), 3)
      runOnce()

      val got = writer.read(spark, "latest")
        .select(col("user_id"), col("event_id"), col("v"))
        .as[(Long, Long, String)].collect().toSet
      val want = all.toDF("event_id", "ts", "user_id", "v")
        .withColumn("__rn", row_number().over(latestW))
        .filter(col("__rn") === 1)
        .select(col("user_id"), col("event_id"), col("v"))
        .as[(Long, Long, String)].collect().toSet
      assert(got == want, "restarted stream diverged from the batch answer")

      // phase 3: restart with NO new data — no batches run, table stable
      runOnce()
      val again = writer.read(spark, "latest")
        .select(col("user_id"), col("event_id"), col("v"))
        .as[(Long, Long, String)].collect().toSet
      assert(again == want)
    } finally {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
