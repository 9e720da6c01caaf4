package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable
import graft.streaming.{VtCdfStream, VtCdfMicroBatchStream, VtCdfOffset, VtCdfPartition}

/** The streaming CDF source ([[VtCdfStream]] — readStream over a
  * VersionedTable's commit history; the r11 verdict's Missing #3).
  * Pins: per-version change rows equal [[VersionedTable.changesBetween]]
  * for every adjacent pair (and the oldest retained version streams as
  * pure inserts); restart from a checkpoint emits ONLY versions
  * committed since; `startingVersion=latest` skips history; planning is
  * bucket-pruned (one partition per version step × CHANGED bucket — no
  * partition for untouched buckets); vacuuming past a stream's offset
  * refuses loudly at the next plan; additive schema evolution
  * null-fills and classifies updates correctly.
  */
class VtCdfStreamSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit(); d.getPath
  }

  private def buildTable(root: String): Unit = {
    val base = (1 to 40).map(k => (k.toLong, k * 10L, s"n$k"))
      .toDF("k", "price", "name")
    val upd = (1 to 40).filter(_ % 8 == 0)
      .map(k => (k.toLong, k * 10L + 1, s"n$k")).toDF("k", "price", "name")
    val ins = Seq((101L, 7L, "new1"), (102L, 8L, "new2")).toDF("k", "price", "name")
    VersionedTable.commitMerge(spark, root, base, "k", 8)            // v0
    VersionedTable.commitMerge(spark, root, upd.unionByName(ins), "k", 8) // v1
    VersionedTable.commitDelete(spark, root,
      (1 to 40).filter(_ % 10 == 0).map(_.toLong).toDF("k"), "k", 8) // v2
  }

  private def collectStream(root: String, name: String,
      checkpoint: String, startingVersion: Option[String] = None)
      : Seq[(String, Long, Long, Long, String)] = {
    val r0 = spark.readStream.format(VtCdfStream.format)
      .option("root", root).option("key", "k")
    val r = startingVersion.fold(r0)(v => r0.option("startingVersion", v))
    // foreachBatch, not the memory sink: memory cannot RECOVER from a
    // checkpoint, and restart semantics are exactly what these tests pin
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, Long, Long, String)]
    val q = r.load().writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("change_op", "_commit_version", "k", "price", "name")
          .collect()
          .foreach(row => buf.add((row.getString(0), row.getLong(1),
            row.getLong(2), row.getLong(3), row.getString(4))))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    buf.iterator().asScala.toSeq
  }

  private def cdfRows(root: String, fromV: Long, toV: Long, v: Long) =
    VersionedTable.changesBetween(spark, root, "k", fromV, toV)
      .select(col("change_op"), lit(v).as("_commit_version"),
        col("k"), col("price"), col("name"))
      .collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getString(4))).toSeq

  test("full-history stream: v0 as inserts, then per-version rows equal " +
      "changesBetween for every adjacent pair") {
    val dir = freshDir("vtcdf1")
    val root = s"$dir/t"
    buildTable(root)
    val got = collectStream(root, "vtcdf_all", s"$dir/ck")
    val v0 = VersionedTable.read(spark, root, Some(0L))
      .select(lit("insert").as("op"), lit(0L).as("v"),
        col("k"), col("price"), col("name"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    val expect = v0 ++ cdfRows(root, 0, 1, 1L) ++ cdfRows(root, 1, 2, 2L)
    assert(got.sorted === expect.sorted)
    // spot-check the vocabulary composes: updates carry both images
    assert(got.count(_._1 == "update_pre") === 5)  // k%8==0 → 8,16,24,32,40
    assert(got.count(_._1 == "update_post") === 5)
    assert(got.count(t => t._1 == "delete" && t._2 == 2L) === 4) // 10,20,30,40
  }

  test("restart from a checkpoint emits only versions committed since") {
    val dir = freshDir("vtcdf2")
    val root = s"$dir/t"
    buildTable(root)
    collectStream(root, "vtcdf_r1", s"$dir/ck")
    // new commit AFTER the first run drained to the head
    VersionedTable.commitMerge(spark, root,
      Seq((200L, 5L, "late")).toDF("k", "price", "name"), "k", 8) // v3
    val got2 = collectStream(root, "vtcdf_r2", s"$dir/ck")
    // memory sink table is fresh per query name: only the NEW rows land
    assert(got2 === Seq(("insert", 3L, 200L, 5L, "late")))
  }

  test("startingVersion=latest skips history; a later commit streams") {
    val dir = freshDir("vtcdf3")
    val root = s"$dir/t"
    buildTable(root)
    val got = collectStream(root, "vtcdf_l1", s"$dir/ck",
      startingVersion = Some("latest"))
    assert(got.isEmpty)
    VersionedTable.commitMerge(spark, root,
      Seq((300L, 6L, "post")).toDF("k", "price", "name"), "k", 8) // v3
    val got2 = collectStream(root, "vtcdf_l2", s"$dir/ck",
      startingVersion = Some("latest"))
    assert(got2 === Seq(("insert", 3L, 300L, 6L, "post")))
  }

  test("planning is bucket-pruned: one partition per version step x " +
      "CHANGED bucket only") {
    val dir = freshDir("vtcdf4")
    val root = s"$dir/t"
    buildTable(root)
    val schema = VtCdfStream.fullSchema(VtCdfStream.dataSchema(spark, root))
    val mbs = new VtCdfMicroBatchStream(schema, root, "k", "earliest")
    // v1 -> v2 is the delete of 4 keys: only their buckets changed
    val delBuckets = (1 to 40).filter(_ % 10 == 0).map(_.toLong).toDF("k")
      .select(pmod(xxhash64(col("k")), lit(8L)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val parts = mbs.planInputPartitions(VtCdfOffset(1L), VtCdfOffset(2L))
      .map(_.asInstanceOf[VtCdfPartition])
    assert(parts.map(_.bucket).toSet === delBuckets)
    assert(parts.forall(_.version == 2L))
    // v0 (floor) plans with NO old files — the full-state insert replay,
    // which requires the offset's recorded replay entitlement
    val p0 = mbs.planInputPartitions(
        VtCdfOffset(-1L, replayBase = 0L), VtCdfOffset(0L))
      .map(_.asInstanceOf[VtCdfPartition])
    assert(p0.nonEmpty && p0.forall(_.oldFiles.isEmpty))
  }

  test("offset json round-trips both forms (plain version and " +
      "version@replayBase)") {
    assert(VtCdfOffset.parse("7") === VtCdfOffset(7L))
    assert(VtCdfOffset.parse(VtCdfOffset(7L).json()) === VtCdfOffset(7L))
    assert(VtCdfOffset.parse(VtCdfOffset(-1L, 0L).json())
      === VtCdfOffset(-1L, 0L))
    assert(VtCdfOffset(3L, 4L).json() === "3@4")
  }

  test("a NON-virgin stream whose predecessor was vacuumed refuses " +
      "loudly instead of re-emitting the full state as inserts") {
    val dir = freshDir("vtcdf9")
    val root = s"$dir/t"
    buildTable(root) // v0..v2
    val schema = VtCdfStream.fullSchema(VtCdfStream.dataSchema(spark, root))
    val mbs = new VtCdfMicroBatchStream(schema, root, "k", "earliest")
    // the stream emitted v0..v1 (offset 1, replay entitlement was v0);
    // vacuum drops v0..v1, leaving v2 as the floor — planning v2 must
    // NOT treat "v == floor" as a full-insert replay (that would
    // duplicate every row downstream); it must refuse loudly
    VersionedTable.vacuum(spark, root, retainLast = 1)
    val e = intercept[IllegalArgumentException] {
      mbs.planInputPartitions(VtCdfOffset(1L, replayBase = 0L),
        VtCdfOffset(2L, replayBase = 0L))
    }
    assert(e.getMessage.contains("duplicate inserts"))
    // a VIRGIN stream over the vacuumed table still full-replays the
    // new floor: its entitlement names v2
    val virgin = new VtCdfMicroBatchStream(schema, root, "k", "earliest")
    val init = virgin.initialOffset().asInstanceOf[VtCdfOffset]
    assert(init === VtCdfOffset(1L, replayBase = 2L))
    val parts = virgin.planInputPartitions(init, VtCdfOffset(2L, 2L))
      .map(_.asInstanceOf[VtCdfPartition])
    assert(parts.nonEmpty && parts.forall(_.oldFiles.isEmpty))
  }

  test("maxVersionsPerTrigger=1: a 3-version backlog drains in three " +
      "single-version micro-batches (admission control)") {
    val dir = freshDir("vtcdf7")
    val root = s"$dir/t"
    buildTable(root)
    val perBatch = new java.util.concurrent.ConcurrentLinkedQueue[Set[Long]]
    val q = spark.readStream.format(VtCdfStream.format)
      .option("root", root).option("key", "k")
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", s"$dir/ck")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        perBatch.add(df.select("_commit_version").distinct()
          .collect().map(_.getLong(0)).toSet)
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    val batches = perBatch.iterator().asScala.toSeq.filter(_.nonEmpty)
    assert(batches === Seq(Set(0L), Set(1L), Set(2L)),
      s"each micro-batch must admit exactly one version, got $batches")
  }

  test("vacuum past the stream's offset refuses loudly at the next plan") {
    val dir = freshDir("vtcdf5")
    val root = s"$dir/t"
    buildTable(root)
    val schema = VtCdfStream.fullSchema(VtCdfStream.dataSchema(spark, root))
    val mbs = new VtCdfMicroBatchStream(schema, root, "k", "earliest")
    VersionedTable.vacuum(spark, root, retainLast = 1)
    val e = intercept[IllegalArgumentException] {
      mbs.planInputPartitions(VtCdfOffset(0L), VtCdfOffset(2L))
    }
    assert(e.getMessage.contains("vacuum"))
  }

  test("composes with optimistic writers: racing commits stream as " +
      "contiguous exact versions (no torn or skipped micro-batch)") {
    import graft.sources.VersionedTable.CommitConflictException
    val dir = freshDir("vtcdf8")
    val root = s"$dir/t"
    // 3 concurrent optimistic writers, 2 commits each, overlapping keys
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until 3).map { t =>
      new Thread(() => {
        try {
          for (i <- 0 until 2) {
            var done = false
            var tries = 0
            while (!done) {
              try {
                VersionedTable.commitMergeOptimistic(spark, root,
                  (1 to 60).filter(_ % 3 == t)
                    .map(k => (k.toLong, k * 100L + t * 10 + i, s"w$t"))
                    .toDF("k", "price", "name"),
                  "k", 8, writerId = s"w$t")
                done = true
              } catch {
                case _: CommitConflictException =>
                  tries += 1
                  if (tries > 50) throw new IllegalStateException("starved")
              }
            }
          }
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(300000))
    assert(errs.isEmpty, s"writer failed: ${Option(errs.peek())}")
    val vs = VersionedTable.versions(spark, root)
    assert(vs === (0L until 6L).toSeq)
    // drain the whole history; every version's rows must equal the
    // batch CDF for that pair — racing writers never tear a version
    val got = collectStream(root, "vtcdf_occ", s"$dir/ck")
    val byV = got.groupBy(_._2)
    assert(byV.keySet === (0L until 6L).toSet,
      s"every version must stream, got ${byV.keySet}")
    val v0 = VersionedTable.read(spark, root, Some(0L))
      .select(lit("insert").as("op"), lit(0L).as("v"),
        col("k"), col("price"), col("name"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).toSeq
    assert(byV(0L).sorted === v0.sorted)
    (1L until 6L).foreach { v =>
      assert(byV.getOrElse(v, Nil).sorted === cdfRows(root, v - 1, v, v).sorted,
        s"version $v's streamed rows must equal its batch CDF")
    }
    // final replay: applying post-images/deletes in version order
    // reproduces the table (the replica contract, writer races included)
    val replay = scala.collection.mutable.Map.empty[Long, (Long, String)]
    got.sortBy(_._2).foreach {
      case ("insert" | "update_post", _, k, p, n) => replay(k) = (p, n)
      case ("delete", _, k, _, _) => replay.remove(k)
      case _ => ()
    }
    val fin = VersionedTable.read(spark, root).select("k", "price", "name")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(replay.toMap === fin)
  }

  test("additive schema evolution: old generations null-fill the new " +
      "column; update classification stays exact") {
    val dir = freshDir("vtcdf6")
    val root = s"$dir/t"
    VersionedTable.commitMerge(spark, root,
      (1 to 10).map(k => (k.toLong, k * 10L)).toDF("k", "price"), "k", 4) // v0
    VersionedTable.commitMerge(spark, root,
      Seq((3L, 31L, "tagged")).toDF("k", "price", "tag"), "k", 4)        // v1
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, Long, Long, Option[String])]
    val q = spark.readStream.format(VtCdfStream.format)
      .option("root", root).option("key", "k").load()
      .writeStream.option("checkpointLocation", s"$dir/ck")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("change_op", "_commit_version", "k", "price", "tag")
          .collect()
          .foreach(r => buf.add((r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), Option(r.getString(4)))))
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    val rows = buf.iterator().asScala.toSeq
    assert(rows.count(_._2 == 0L) === 10)
    assert(rows.filter(_._2 == 0L).forall(r => r._1 == "insert" && r._5.isEmpty))
    val v1 = rows.filter(_._2 == 1L).sortBy(_._1)
    assert(v1 === Seq( // sorted by op name: post < pre lexicographically
      ("update_post", 1L, 3L, 31L, Some("tagged")),
      ("update_pre", 1L, 3L, 30L, None)))
  }
}
