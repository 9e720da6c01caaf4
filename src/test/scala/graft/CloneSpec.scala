package graft

import graft.sources.TableWriter
import org.apache.spark.sql.functions._

/** Shallow clone + copy-on-write branch (q95) physical semantics:
  * a clone is O(files) metadata (zero data files written); reads resolve
  * pointed + local buckets; merge/delete into a clone materializes ONLY
  * the touched buckets locally and never touches the source; cloning a
  * clone flattens the pointers.
  */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFilesUnder(dir: String): Seq[String] =
    parquetFileSigs(dir).keys.toSeq

  private def fileSigs(dir: String): Map[String, (Long, Long)] =
    parquetFileSigs(dir)

  private def content(w: TableWriter, name: String): Set[(Long, Long)] =
    w.readResolved(spark, name).select(col("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def freshStore(): (TableWriter, String) = {
    val dir = java.nio.file.Files.createTempDirectory("clone").toString
    (new TableWriter(dir), dir)
  }

  private def seed(w: TableWriter): Unit = {
    val base = (0L until 64L).map(k => (k, k * 10)).toDF("k", "v")
    w.mergeByKey(spark, "src", base, "k", numBuckets = 8)
  }

  test("clone writes zero data files and reads identically") {
    val (w, dir) = freshStore(); seed(w)
    val before = fileSigs(s"$dir/src")
    w.shallowClone(spark, "src", "branch")
    assert(parquetFilesUnder(s"$dir/branch").isEmpty,
      "shallow clone must not copy data")
    assert(new java.io.File(s"$dir/branch/_clone_manifest").exists)
    assert(content(w, "branch") == content(w, "src"))
    assert(fileSigs(s"$dir/src") == before, "clone touched the source")
  }

  test("COW merge materializes only touched buckets; source untouched") {
    val (w, dir) = freshStore(); seed(w)
    w.shallowClone(spark, "src", "branch")
    val srcBefore = fileSigs(s"$dir/src")
    val batch = Seq((3L, 999L), (64L, 640L)).toDF("k", "v")
    w.mergeByKey(spark, "branch", batch, "k", numBuckets = 8)

    // source: bytes and content both unchanged
    assert(fileSigs(s"$dir/src") == srcBefore)
    assert(content(w, "src") == (0L until 64L).map(k => (k, k * 10)).toSet)

    // branch: batch applied
    val expect = (0L until 64L).map(k => (k, if (k == 3) 999L else k * 10))
      .toSet + ((64L, 640L))
    assert(content(w, "branch") == expect)

    // locality: only the touched buckets exist locally
    val touched = batch
      .select(pmod(xxhash64(col("k")), lit(8L)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val localDirs = Option(new java.io.File(s"$dir/branch").listFiles).toSeq
      .flatten.filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
      .map(_.getName.stripPrefix("__bucket=").toInt).toSet
    assert(localDirs == touched,
      s"COW materialized $localDirs, expected exactly touched $touched")

    // untouched buckets still serve via manifest pointers into src
    val mf = scala.io.Source.fromFile(s"$dir/branch/_clone_manifest")
    val pointed = try mf.getLines().map(_.split("\t")(0).toInt).toSet
      finally mf.close()
    assert(pointed == (0 until 8).toSet -- touched)
    pointed.foreach(b => assert(!localDirs.contains(b)))
  }

  test("COW delete drops keys in the branch only") {
    val (w, dir) = freshStore(); seed(w)
    w.shallowClone(spark, "src", "branch")
    val srcBefore = fileSigs(s"$dir/src")
    w.deleteByKey(spark, "branch", Seq(5L, 6L).toDF("k"), "k", numBuckets = 8)
    assert(fileSigs(s"$dir/src") == srcBefore)
    assert(content(w, "branch") ==
      (0L until 64L).filterNot(k => k == 5 || k == 6).map(k => (k, k * 10)).toSet)
    assert(content(w, "src") == (0L until 64L).map(k => (k, k * 10)).toSet)
  }

  test("clone of a clone flattens and stays isolated from both ancestors") {
    val (w, dir) = freshStore(); seed(w)
    w.shallowClone(spark, "src", "b1")
    w.mergeByKey(spark, "b1", Seq((3L, 999L)).toDF("k", "v"), "k",
      numBuckets = 8)
    w.shallowClone(spark, "b1", "b2")
    assert(parquetFilesUnder(s"$dir/b2").isEmpty)
    assert(content(w, "b2") == content(w, "b1"))
    // b2 diverges; b1 and src hold still
    w.mergeByKey(spark, "b2", Seq((7L, 777L)).toDF("k", "v"), "k",
      numBuckets = 8)
    assert(content(w, "b1") ==
      (0L until 64L).map(k => (k, if (k == 3) 999L else k * 10)).toSet)
    assert(content(w, "b2") ==
      (0L until 64L).map(k =>
        (k, if (k == 3) 999L else if (k == 7) 777L else k * 10)).toSet)
    assert(content(w, "src") == (0L until 64L).map(k => (k, k * 10)).toSet)
  }

  test("readResolved on a plain table equals the plain read") {
    val (w, _) = freshStore(); seed(w)
    val plain = w.read(spark, "src").select(col("k"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(content(w, "src") == plain)
  }

  test("a fully-COW'd clone drops its manifest (becomes a plain table)") {
    val (w, dir) = freshStore(); seed(w)
    w.shallowClone(spark, "src", "branch")
    // touch every bucket: one changed key per bucket
    val perBucket = (0L until 64L).map(k => (k, -k))
      .toDF("k", "v")
    w.mergeByKey(spark, "branch", perBucket, "k", numBuckets = 8)
    assert(!new java.io.File(s"$dir/branch/_clone_manifest").exists,
      "manifest should disappear once every bucket is local")
    assert(content(w, "branch") == (0L until 64L).map(k => (k, -k)).toSet)
  }
}
