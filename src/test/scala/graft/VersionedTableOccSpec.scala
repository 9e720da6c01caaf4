package graft

import org.apache.spark.sql.functions._
import graft.sources.VersionedTable
import graft.sources.VersionedTable.{CommitConflictException, OccHooks}

/** Optimistic concurrency for [[VersionedTable]] (the r11 verdict's
  * Missing #2): writers commit WITHOUT the table lease, conflicts are
  * decided at the commit point from the manifests that appeared since
  * the writer's read version, and disjoint-bucket commits REBASE onto
  * the new head instead of serializing or failing. Pins: sequential
  * parity with the leased path, the rebase (a concurrent disjoint
  * commit lands at head+1 with both writers' rows), the conflict abort
  * (overlap → CommitConflictException, staged files cleaned, retry
  * succeeds from a fresh snapshot), both crash windows (pre-publish:
  * swept by reference as dead; post-publish: files kept, marker
  * dropped), mode exclusion both ways, vacuum on an optimistic table
  * (lease taken for the sweep, released after; in-flight markers'
  * files protected), and a multi-threaded hammer whose every version
  * stays readable through rebases and checkpoint boundaries.
  */
class VersionedTableOccSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("vtocc").toFile
    d.deleteOnExit(); d.getPath + "/t"
  }

  private val B = 8 // numBuckets used throughout

  /** key → bucket under the commit paths' hash (computed with the same
    * Spark expression, so the grouping is exact by construction).
    */
  private lazy val bucketOfKey: Map[Long, Int] =
    (1L to 200L).toDF("k")
      .withColumn("b", pmod(xxhash64(col("k")), lit(B.toLong)).cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  private def keysInBucket(b: Int): Seq[Long] =
    (1L to 200L).filter(bucketOfKey(_) == b)

  private def state(root: String, asOf: Option[Long] = None): Map[Long, Long] =
    VersionedTable.read(spark, root, asOf)
      .select("k", "price").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def rows(ks: Seq[Long], tag: Long) =
    ks.map(k => (k, k * 100L + tag)).toDF("k", "price")

  test("sequential optimistic commits: versioned, time-travel exact, " +
      "delete-by-key parity with the leased path") {
    val root = freshRoot()
    val a = keysInBucket(0).take(4)
    val b = keysInBucket(1).take(4)
    val v0 = VersionedTable.commitMergeOptimistic(spark, root,
      rows(a ++ b, 0), "k", B, writerId = "w1")
    val v1 = VersionedTable.commitMergeOptimistic(spark, root,
      rows(a.take(2), 1), "k", B, writerId = "w1")
    val v2 = VersionedTable.commitDeleteOptimistic(spark, root,
      Seq(b.head).toDF("k"), "k", B, writerId = "w1")
    assert((v0, v1, v2) === (0L, 1L, 2L))
    val s0 = (a ++ b).map(k => k -> (k * 100L)).toMap
    val s1 = s0 ++ a.take(2).map(k => k -> (k * 100L + 1))
    val s2 = s1 - b.head
    assert(state(root, Some(0)) === s0)
    assert(state(root, Some(1)) === s1)
    assert(state(root) === s2)
    // no markers linger after clean commits
    val cd = new java.io.File(root, "_commits")
    assert(!cd.listFiles().exists(_.getName.startsWith("staged_occ_")))
  }

  test("disjoint-bucket concurrent commit REBASES: lands at head+1 with " +
      "both writers' rows, no conflict") {
    val root = freshRoot()
    val a = keysInBucket(2).take(4)
    val b = keysInBucket(3).take(4)
    VersionedTable.commitMergeOptimistic(spark, root, rows(a ++ b, 0),
      "k", B, writerId = "w1")
    var interleaved = 0L
    val hooks = OccHooks(beforePublish = () => {
      // writer B commits a DISJOINT bucket while A sits between its
      // move-in and its publish
      interleaved = VersionedTable.commitMergeOptimistic(spark, root,
        rows(b, 7), "k", B, writerId = "wB")
    })
    val committed = VersionedTable.commitMergeOptimistic(spark, root,
      rows(a, 5), "k", B, writerId = "wA", hooks = hooks)
    assert(interleaved === 1L)
    assert(committed === 2L, "A must rebase onto B's head, not overwrite it")
    val expect = a.map(k => k -> (k * 100L + 5)).toMap ++
      b.map(k => k -> (k * 100L + 7)).toMap
    assert(state(root) === expect)
    // B's intermediate version is intact too (A's delta applied over it)
    assert(state(root, Some(1)) ===
      (a.map(k => k -> (k * 100L)).toMap ++ b.map(k => k -> (k * 100L + 7))))
  }

  test("overlapping-bucket concurrent commit ABORTS with cleanup; the " +
      "retry sees the fresh snapshot and preserves the other writer's row") {
    val root = freshRoot()
    val shared = keysInBucket(4).take(6)
    VersionedTable.commitMergeOptimistic(spark, root, rows(shared.take(2), 0),
      "k", B, writerId = "w1")
    val hooks = OccHooks(beforePublish = () => {
      VersionedTable.commitMergeOptimistic(spark, root,
        rows(Seq(shared(2)), 7), "k", B, writerId = "wB")
    })
    val e = intercept[CommitConflictException] {
      VersionedTable.commitMergeOptimistic(spark, root,
        rows(Seq(shared(3)), 5), "k", B, writerId = "wA", hooks = hooks)
    }
    assert(e.getMessage.contains("bucket"))
    // cleanup: no marker, no orphaned files from A's attempt
    val cd = new java.io.File(root, "_commits")
    assert(!cd.listFiles().exists(_.getName === "staged_occ_wA"))
    val orphans = new java.io.File(root).listFiles().toSeq
      .filter(_.getName.startsWith("__bucket="))
      .flatMap(_.listFiles().toSeq)
      .filter(_.getName.startsWith("occ-wA-"))
    assert(orphans.isEmpty, s"aborted attempt left files: $orphans")
    // retry: fresh snapshot includes wB's row; both survive
    val v = VersionedTable.commitMergeOptimistic(spark, root,
      rows(Seq(shared(3)), 5), "k", B, writerId = "wA")
    assert(v === 2L)
    assert(state(root) === Map(
      shared(0) -> (shared(0) * 100L), shared(1) -> (shared(1) * 100L),
      shared(2) -> (shared(2) * 100L + 7), shared(3) -> (shared(3) * 100L + 5)))
  }

  test("read version vacuumed mid-commit: CommitConflictException with " +
      "cleanup, not a raw missing-manifest error leaking the marker") {
    val root = freshRoot()
    val a = keysInBucket(1).take(3)
    val b = keysInBucket(2).take(3)
    VersionedTable.commitMergeOptimistic(spark, root, rows(a, 0),
      "k", B, writerId = "w1")
    // while wA is between stage and publish, wB advances the head and a
    // retention sweep drops wA's read version — the conflict set is
    // undecidable, so wA must abort CLEANLY (conflict exception, staged
    // files + marker cleaned), not blow up on "no manifest for version 0"
    val hooks = OccHooks(beforePublish = () => {
      VersionedTable.commitMergeOptimistic(spark, root, rows(b, 7),
        "k", B, writerId = "wB")
      VersionedTable.vacuum(spark, root, retainLast = 1)
    })
    val e = intercept[CommitConflictException] {
      VersionedTable.commitMergeOptimistic(spark, root, rows(a, 5),
        "k", B, writerId = "wA", hooks = hooks)
    }
    assert(e.getMessage.contains("no longer resolvable"))
    val cd = new java.io.File(root, "_commits")
    assert(!cd.listFiles().exists(_.getName === "staged_occ_wA"))
    val orphans = new java.io.File(root).listFiles().toSeq
      .filter(_.getName.startsWith("__bucket="))
      .flatMap(_.listFiles().toSeq)
      .filter(_.getName.startsWith("occ-wA-"))
    assert(orphans.isEmpty, s"aborted attempt left files: $orphans")
    // the advised retry lands from a fresh snapshot
    val v = VersionedTable.commitMergeOptimistic(spark, root, rows(a, 5),
      "k", B, writerId = "wA")
    assert(v === 2L)
    assert(state(root) === (a.map(k => k -> (k * 100L + 5)) ++
      b.map(k => k -> (k * 100L + 7))).toMap)
  }

  test("crash BEFORE publish: the dead attempt's files are swept by " +
      "reference on the writer's next commit") {
    val root = freshRoot()
    val a = keysInBucket(5).take(4)
    VersionedTable.commitMergeOptimistic(spark, root, rows(a.take(2), 0),
      "k", B, writerId = "w1")
    val boom = OccHooks(beforePublish = () => throw new RuntimeException("crash"))
    intercept[RuntimeException] {
      VersionedTable.commitMergeOptimistic(spark, root, rows(a, 3),
        "k", B, writerId = "w1", hooks = boom)
    }
    // marker + moved-in files linger (the crash left them); version did
    // not advance
    val cd = new java.io.File(root, "_commits")
    assert(cd.listFiles().exists(_.getName === "staged_occ_w1"))
    assert(VersionedTable.latestVersion(spark, root) === Some(0L))
    assert(state(root) === a.take(2).map(k => k -> (k * 100L)).toMap)
    // next commit by the same writer sweeps the dead files, then lands
    val v = VersionedTable.commitMergeOptimistic(spark, root, rows(a, 4),
      "k", B, writerId = "w1")
    assert(v === 1L)
    assert(state(root) === a.map(k => k -> (k * 100L + 4)).toMap)
    // the retry reuses the attempt prefix (same writer, same readV), so
    // name-matching can't tell dead from live — the real invariant is
    // REFERENCE: every on-disk file is named by some retained manifest
    // (the dead attempt's files were swept, the retry's are committed)
    val referenced = VersionedTable.versions(spark, root)
      .flatMap(v => VersionedTable.resolvedEntries(spark, root, v).values.flatten)
      .map(p => new java.io.File(new java.net.URI(p).getPath).getName).toSet
    val onDisk = new java.io.File(root).listFiles().toSeq
      .filter(_.getName.startsWith("__bucket="))
      .flatMap(_.listFiles().toSeq).map(_.getName)
      .filterNot(_.startsWith(".")) // Hadoop .crc sidecars
      .toSet
    assert((onDisk -- referenced).isEmpty,
      s"unreferenced litter survived the sweep: ${onDisk -- referenced}")
  }

  test("crash AFTER publish, before marker cleanup: the commit stands, " +
      "the next commit drops only the marker") {
    val root = freshRoot()
    val a = keysInBucket(6).take(4)
    VersionedTable.commitMergeOptimistic(spark, root, rows(a.take(2), 0),
      "k", B, writerId = "w1")
    val boom = OccHooks(afterPublish = () => throw new RuntimeException("crash"))
    intercept[RuntimeException] {
      VersionedTable.commitMergeOptimistic(spark, root, rows(a, 3),
        "k", B, writerId = "w1", hooks = boom)
    }
    assert(VersionedTable.latestVersion(spark, root) === Some(1L))
    assert(state(root) === a.map(k => k -> (k * 100L + 3)).toMap)
    val v = VersionedTable.commitMergeOptimistic(spark, root,
      rows(a.take(1), 9), "k", B, writerId = "w1")
    assert(v === 2L)
    // v1 (the crashed-but-committed version) still reads exactly
    assert(state(root, Some(1)) === a.map(k => k -> (k * 100L + 3)).toMap)
    val cd = new java.io.File(root, "_commits")
    assert(!cd.listFiles().exists(_.getName === "staged_occ_w1"))
  }

  test("mode exclusion: optimistic refuses a leased table; leased paths " +
      "refuse optimistic markers until sweepOcc clears a dead writer") {
    val leased = freshRoot()
    VersionedTable.commitMerge(spark, leased, rows(Seq(1L, 2L), 0), "k", B)
    val e1 = intercept[IllegalArgumentException] {
      VersionedTable.commitMergeOptimistic(spark, leased,
        rows(Seq(3L), 1), "k", B, writerId = "w2")
    }
    assert(e1.getMessage.contains("single-writer lease"))

    val occ = freshRoot()
    VersionedTable.commitMergeOptimistic(spark, occ, rows(Seq(1L, 2L), 0),
      "k", B, writerId = "w1")
    // leave a dead attempt's marker behind
    intercept[RuntimeException] {
      VersionedTable.commitMergeOptimistic(spark, occ, rows(Seq(3L), 1),
        "k", B, writerId = "w1",
        hooks = OccHooks(beforePublish = () => throw new RuntimeException("x")))
    }
    val e2 = intercept[IllegalArgumentException] {
      VersionedTable.commitMerge(spark, occ, rows(Seq(4L), 2), "k", B)
    }
    assert(e2.getMessage.contains("optimistic commit marker"))
    VersionedTable.releaseLease(spark, occ) // commitMerge's acquire left one
    VersionedTable.sweepOcc(spark, occ, "w1")
    VersionedTable.commitMerge(spark, occ, rows(Seq(4L), 2), "k", B)
    assert(state(occ) === Map(1L -> 100L, 2L -> 200L, 4L -> 402L))
  }

  test("vacuum on an optimistic table: retained floor re-anchored, lease " +
      "released after, in-flight markers' files protected") {
    val root = freshRoot()
    val a = keysInBucket(7).take(3)
    for (i <- 0 until 5)
      VersionedTable.commitMergeOptimistic(spark, root, rows(a, i.toLong),
        "k", B, writerId = "w1")
    // an in-flight attempt from ANOTHER writer: moved in, not committed
    intercept[RuntimeException] {
      VersionedTable.commitMergeOptimistic(spark, root, rows(a, 99), "k", B,
        writerId = "wX",
        hooks = OccHooks(beforePublish = () => throw new RuntimeException("x")))
    }
    val before = new java.io.File(root).listFiles().toSeq
      .filter(_.getName.startsWith("__bucket="))
      .flatMap(_.listFiles().toSeq).map(_.getName)
      .filter(_.startsWith("occ-wX-")).toSet
    assert(before.nonEmpty)
    val (dropped, _) = VersionedTable.vacuum(spark, root, retainLast = 2)
    assert(dropped === 3)
    val after = new java.io.File(root).listFiles().toSeq
      .filter(_.getName.startsWith("__bucket="))
      .flatMap(_.listFiles().toSeq).map(_.getName)
      .filter(_.startsWith("occ-wX-")).toSet
    assert(after === before, "vacuum must not adjudicate another writer's attempt")
    assert(state(root) === a.map(k => k -> (k * 100L + 4)).toMap)
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, root, Some(0L))
    }
    // the lease vacuum took for its own duration is gone: optimistic
    // commits work again without any release step
    val v = VersionedTable.commitMergeOptimistic(spark, root, rows(a, 8),
      "k", B, writerId = "w1")
    assert(v === 5L)
  }

  test("multi-threaded hammer: disjoint key ranges, distinct writers, " +
      "retry-on-conflict — every version readable, union state exact") {
    val root = freshRoot()
    val ranges: Seq[(String, Seq[Long])] = (0 until 4).map { t =>
      (s"t$t", (1L to 200L).filter(_ % 4 == t))
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = ranges.map { case (wid, ks) =>
      new Thread(() => {
        try {
          // 3 commits per writer, each retried until it lands (bucket
          // overlap across writers is expected — keys interleave)
          for (i <- 0 until 3) {
            var done = false
            var tries = 0
            while (!done) {
              try {
                VersionedTable.commitMergeOptimistic(spark, root,
                  rows(ks, i.toLong), "k", B, writerId = wid)
                done = true
              } catch {
                case _: CommitConflictException =>
                  tries += 1
                  if (tries > 50) throw new IllegalStateException(
                    s"$wid starved after $tries conflict retries")
              }
            }
          }
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(300000))
    assert(errs.isEmpty, s"writer failed: ${Option(errs.peek())}")
    val vs = VersionedTable.versions(spark, root)
    assert(vs === (0L until vs.size).toSeq, "versions must be contiguous")
    assert(vs.size === 12, "every commit must have landed exactly once")
    // final state: every key at its writer's LAST tag (i=2)
    assert(state(root) === (1L to 200L).map(k => k -> (k * 100L + 2)).toMap)
    // every retained version resolves through the delta/checkpoint chain
    vs.foreach(v => VersionedTable.read(spark, root, Some(v)).count())
    // no markers or stage litter
    val cd = new java.io.File(root, "_commits")
    assert(!cd.listFiles().exists(_.getName.startsWith("staged_occ_")))
  }
}
