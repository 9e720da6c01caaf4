package graft

import graft.sources.TableWriter
import org.apache.spark.sql.functions._

/** Structural claims of TableWriter.deleteByKey that the q71 oracle entry
  * (content fidelity) cannot see: which bucket partitions are touched,
  * byte-stability of the untouched ones, and removal of emptied bucket
  * dirs (dynamic overwrite can't write an empty partition, so the
  * operator must delete those dirs explicitly).
  */
class DeleteByKeySpec extends SparkSpec {
  import spark.implicits._

  /** bucket-dir name -> file name -> sha256, visible parquet files only */
  private def layout(root: String): Map[String, Map[String, String]] = {
    val r = java.nio.file.Paths.get(root)
    val dirs = java.nio.file.Files.list(r)
    try {
      import scala.jdk.CollectionConverters._
      dirs.iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("__bucket="))
        .map { d =>
          val files = java.nio.file.Files.list(d)
          try {
            d.getFileName.toString -> files.iterator().asScala
              .map(_.getFileName.toString)
              .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
              .map { n =>
                val md = java.security.MessageDigest.getInstance("SHA-256")
                n -> md.digest(java.nio.file.Files.readAllBytes(d.resolve(n)))
                  .map("%02x".format(_)).mkString
              }.toMap
          } finally files.close()
        }.toMap
    } finally dirs.close()
  }

  test("deleteByKey: untouched buckets byte-identical, emptied dir removed, idempotent content") {
    val dir = java.nio.file.Files.createTempDirectory("graft-delete").toString
    val w = new TableWriter(dir)
    val rows = (0L until 1000L).toDF("k").withColumn("v", col("k") * 3)
    w.mergeByKey(spark, "t", rows, "k", numBuckets = 8)

    // derive each key's bucket exactly as the layout did (read it back)
    val byBucket = spark.read.parquet(w.path("t"))
      .select(col("k"), col("__bucket").cast("int").as("b"))
      .as[(Long, Int)].collect().groupBy(_._2)
      .map { case (b, ks) => b -> ks.map(_._1).toSet }
    assert(byBucket.size == 8, "1000 sequential keys should hit all 8 buckets")
    val emptied = byBucket.keys.min // fully delete this bucket
    val partial = byBucket.keys.max // delete 3 keys from this one
    val partialVictims = byBucket(partial).toSeq.sorted.take(3).toSet
    val doomed = (byBucket(emptied) ++ partialVictims).toSeq.toDF("k")
      // plus keys absent from the table: deletes must tolerate no-ops
      .unionByName(Seq(-1L, -2L).toDF("k"))

    val before = layout(w.path("t"))
    w.deleteByKey(spark, "t", doomed, "k", numBuckets = 8)
    val after = layout(w.path("t"))

    // emptied bucket dir is gone; partial bucket was rewritten
    assert(!after.contains(s"__bucket=$emptied"))
    assert(after.contains(s"__bucket=$partial"))
    // every bucket not hosting a doomed key is byte-identical
    val touched = Set(s"__bucket=$emptied", s"__bucket=$partial")
    for ((d, files) <- before if !touched(d))
      assert(after(d) == files, s"untouched $d was rewritten")

    val expect = (0L until 1000L).toSet -- byBucket(emptied) -- partialVictims
    def content() = w.read(spark, "t").select(col("k"), col("v"))
      .as[(Long, Long)].collect().toMap
    assert(content() == expect.map(k => k -> k * 3).toMap)

    // re-running the same delete is a FULL structural no-op: the
    // semi-join probe finds no doomed rows left, so nothing is written
    w.deleteByKey(spark, "t", doomed, "k", numBuckets = 8)
    assert(layout(w.path("t")) == after, "re-run rewrote something")
    assert(content() == expect.map(k => k -> k * 3).toMap)
  }

  test("deleteByKey: string keys ride the same hash-bucket derivation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-delete-s").toString
    val w = new TableWriter(dir)
    val rows = (0 until 200).map(i => s"user-$i").toDF("k")
      .withColumn("v", length(col("k")))
    w.mergeByKey(spark, "t", rows, "k", numBuckets = 4)
    w.deleteByKey(spark, "t",
      (0 until 200 by 7).map(i => s"user-$i").toDF("k"), "k", numBuckets = 4)
    val got = w.read(spark, "t").select("k").as[String].collect().toSet
    assert(got == (0 until 200).filterNot(_ % 7 == 0).map(i => s"user-$i").toSet)
  }
}
