package graft

import graft.operators.SnapshotStore
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Structural claims of SnapshotStore.vacuum that the q72 oracle entry
  * (reconstruction fidelity) cannot see: which run partitions are
  * touched, byte-stability of the post-cutoff ones, removal of the
  * expired dirs, and the single-run no-op.
  */
class SnapshotVacuumSpec extends SparkSpec {
  import spark.implicits._

  private def files(dir: java.nio.file.Path): Map[String, String] = {
    if (!java.nio.file.Files.isDirectory(dir)) return Map.empty
    val s = java.nio.file.Files.list(dir)
    try s.iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("."))
      .map { p =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        p.getFileName.toString -> md.digest(java.nio.file.Files.readAllBytes(p))
          .map("%02x".format(_)).mkString
      }.toMap
    finally s.close()
  }

  private def presented(df: org.apache.spark.sql.DataFrame) = df
    .select(col("k"), col("v"),
      col("valid_from").cast("string"), col("valid_to").cast("string"))
    .as[(Long, String, String, String)].collect().toSet

  test("run: out-of-order backfill of a never-persisted date is rejected; true re-run still works") {
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-02-01")
    val d3 = java.sql.Date.valueOf("2024-03-01")
    val v1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val v3 = Seq((1L, "A"), (2L, "b")).toDF("k", "v")
    val wh = java.nio.file.Files.createTempDirectory("graft_snapbf_")
    try {
      val writer = new graft.sources.TableWriter(wh.toString)
      SnapshotStore.run(spark, writer, "t", v1, "k", Seq("v"), d1)
      SnapshotStore.run(spark, writer, "t", v3, "k", Seq("v"), d3)
      // d2 < runs.max and was never persisted: the old code silently took
      // the re-run path and wrote a delta no later run merged (fast-path
      // and windowed readers then disagree). Now it refuses.
      val e = intercept[IllegalArgumentException](
        SnapshotStore.run(spark, writer, "t", v1, "k", Seq("v"), d2))
      assert(e.getMessage.contains("backfill"))
      // a genuine re-run of a persisted date (d1) is still allowed and
      // leaves the presented state unchanged
      val before = presented(SnapshotStore.read(spark, writer, "t", "k").get)
      SnapshotStore.run(spark, writer, "t", v1, "k", Seq("v"), d1)
      assert(presented(SnapshotStore.read(spark, writer, "t", "k").get) == before)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(wh.toString)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(wh.toString), true)
    }
  }

  test("vacuum: collapses prefix runs, expired dirs gone, post-cutoff runs byte-stable") {
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-02-01")
    val d3 = java.sql.Date.valueOf("2024-03-01")
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val v2 = Seq((1L, "a"), (2L, "B"), (5L, "e")).toDF("k", "v")
    val v3 = Seq((1L, "A"), (2L, "B"), (5L, "e"), (7L, "g")).toDF("k", "v")
    val wh = java.nio.file.Files.createTempDirectory("graft_snapvac_")
    try {
      val writer = new graft.sources.TableWriter(wh.toString)
      SnapshotStore.run(spark, writer, "t", v1, "k", Seq("v"), d1)
      SnapshotStore.run(spark, writer, "t", v2, "k", Seq("v"), d2)
      SnapshotStore.run(spark, writer, "t", v3, "k", Seq("v"), d3)
      val root = java.nio.file.Paths.get(writer.path("t"))
      val beforeRecon = presented(SnapshotStore.read(spark, writer, "t", "k").get)
      val run3Before = files(root.resolve("snap_run=2024-03-01"))
      assert(run3Before.nonEmpty)

      SnapshotStore.vacuum(spark, writer, "t", "k", d2)
      // expired run dir removed; collapsed partition holds the prefix;
      // the post-cutoff run is byte-identical
      assert(!java.nio.file.Files.exists(root.resolve("snap_run=2024-01-01")))
      assert(files(root.resolve("snap_run=2024-02-01")).nonEmpty)
      assert(files(root.resolve("snap_run=2024-03-01")) == run3Before)
      // reconstruction is invisible to the vacuum
      assert(presented(SnapshotStore.read(spark, writer, "t", "k").get) == beforeRecon)

      // a second vacuum at the same cutoff is a structural no-op: only
      // one run remains at or before the cutoff
      val collapsed = files(root.resolve("snap_run=2024-02-01"))
      SnapshotStore.vacuum(spark, writer, "t", "k", d2)
      assert(files(root.resolve("snap_run=2024-02-01")) == collapsed)
      assert(files(root.resolve("snap_run=2024-03-01")) == run3Before)

      // time travel below the retention floor clamps to the collapsed
      // state (the doc's promise) — it must NOT silently return empty
      val atFloor = presented(
        SnapshotStore.read(spark, writer, "t", "k", asOf = Some(d2)).get)
      val belowFloor = presented(
        SnapshotStore.read(spark, writer, "t", "k", asOf = Some(d1)).get)
      assert(atFloor.nonEmpty && belowFloor == atFloor)
    } finally {
      val walk = java.nio.file.Files.walk(wh)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("read: current state is exchange-free off the open sidecar; stale sidecar falls back") {
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-02-01")
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val v2 = Seq((1L, "a"), (2L, "B"), (5L, "e")).toDF("k", "v")
    val wh = java.nio.file.Files.createTempDirectory("graft_snapopen_")
    try {
      val writer = new graft.sources.TableWriter(wh.toString)
      SnapshotStore.run(spark, writer, "t", v1, "k", Seq("v"), d1)
      val expected = presented(
        SnapshotStore.run(spark, writer, "t", v2, "k", Seq("v"), d2))

      // the 100 TB claim: the current-state plan is closed-history scan ∪
      // open-sidecar scan — NO exchange, NO window over the full history
      val cur = SnapshotStore.read(spark, writer, "t", "k").get
      assert(presented(cur) == expected)
      val plan = cur.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"current-state read shuffles:\n$plan")
      assert(!plan.contains("Window"), s"current-state read windows:\n$plan")

      // sidecar gone (simulates a crash between history commit and sidecar
      // overwrite, or a pre-sidecar table): reads fall back to the windowed
      // reconstruction and stay correct
      val openDir = java.nio.file.Paths.get(writer.path("t__open"))
      val walk0 = java.nio.file.Files.walk(openDir)
      try walk0.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk0.close()
      val healed = SnapshotStore.read(spark, writer, "t", "k").get
      assert(presented(healed) == expected)
      assert(healed.queryExecution.executedPlan.toString.contains("Window"))

      // re-running the FIRST persisted run is the empty-prior edge (the
      // merge input reconstructs from zero earlier partitions — an empty
      // frame, not None) and must leave the reconstruction unchanged
      // run() returns the CURRENT state (all runs), so both the return
      // and a fresh read must still equal the post-run-2 snapshot; the
      // re-run's sidecar generation (dated d1) must not shadow d2's
      assert(presented(
        SnapshotStore.run(spark, writer, "t", v1, "k", Seq("v"), d1))
        == expected)
      assert(presented(SnapshotStore.read(spark, writer, "t", "k").get)
        == expected)

      // next run heals the sidecar and the fast path returns
      val d3 = java.sql.Date.valueOf("2024-03-01")
      SnapshotStore.run(spark, writer, "t", v2, "k", Seq("v"), d3)
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(writer.path("t__open"), "run_2024-03-01")))
      val again = SnapshotStore.read(spark, writer, "t", "k").get
      assert(!again.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      val walk = java.nio.file.Files.walk(wh)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
