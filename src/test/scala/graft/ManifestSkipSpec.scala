package graft

import graft.sources.{ManifestIndex, TableWriter}
import org.apache.spark.sql.functions._

/** Structural claims of ManifestIndex that the q74 oracle entry (content
  * fidelity) cannot see: how many files the rectangle read actually
  * touches on a clustered vs an unclustered layout, and the null-bounds
  * file rule.
  */
class ManifestSkipSpec extends SparkSpec {
  import spark.implicits._

  test("pruning skips most files on a clustered layout, none on a scattered one") {
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest").toString
    val w = new TableWriter(dir)
    val src = (0L until 10000L).toDF("k")
      .withColumn("a", (col("k") % 1000).cast("int"))
      .withColumn("v", col("k") * 7)

    // clustered: range-partitioned on a → each file owns a narrow a-slice
    src.repartitionByRange(10, col("a")).sortWithinPartitions("a")
      .write.parquet(w.path("clustered"))
    ManifestIndex.build(spark, w.path("clustered"), Seq("a"))
    val hit = ManifestIndex.prunedFiles(spark, w.path("clustered"),
      Seq(("a", 0, 99)))
    assert(hit.size <= 2, s"expected <=2 of 10 files, got ${hit.size}")
    val got = ManifestIndex.readPruned(spark, w.path("clustered"),
      Seq(("a", 0, 99))).filter(col("a") < 100)
      .select("k").as[Long].collect().toSet
    assert(got == (0L until 10000L).filter(_ % 1000 < 100).toSet)

    // scattered: round-robin layout → every file spans all of a, the
    // manifest can rule nothing out (pruning is honest, not magical)
    src.repartition(10).write.parquet(w.path("scattered"))
    ManifestIndex.build(spark, w.path("scattered"), Seq("a"))
    val all = ManifestIndex.prunedFiles(spark, w.path("scattered"),
      Seq(("a", 0, 99)))
    assert(all.size == 10)
  }

  test("countRange: contained files answered from metadata, only boundary files scanned") {
    val dir = java.nio.file.Files.createTempDirectory("graft-metacount").toString
    val w = new TableWriter(dir)
    val src = (0L until 10000L).toDF("k")
      .withColumn("a", (col("k") % 1000).cast("int"))
    src.repartitionByRange(10, col("a")).sortWithinPartitions("a")
      .write.parquet(w.path("t"))
    ManifestIndex.build(spark, w.path("t"), Seq("a"))

    // full span: pure metadata — zero files scanned
    val (nAll, contAll, scanAll) =
      ManifestIndex.countRange(spark, w.path("t"), "a", 0, 999)
    assert(nAll == 10000L && scanAll == 0 && contAll == 10)
    // a range cutting through the layout: boundary files scanned, count exact
    val (nMid, contMid, scanMid) =
      ManifestIndex.countRange(spark, w.path("t"), "a", 150, 449)
    assert(nMid == src.filter(col("a").between(150, 449)).count())
    assert(contMid >= 1 && scanMid >= 1 && contMid + scanMid < 10)
    // empty range: nothing touched
    assert(ManifestIndex.countRange(spark, w.path("t"), "a", 2000, 3000) ==
      ((0L, 0, 0)))
  }

  test("countRange at a 100k-file manifest: contained mass aggregates distributively, driver collects only boundaries") {
    // A synthetic manifest standing in for a 100 TB table's file listing:
    // 100,000 file rows, each owning a disjoint 10-unit range of `a`. No
    // physical files behind the contained rows are needed BECAUSE the
    // point under test is that countRange never touches them — the
    // contained contribution comes from a distributed aggregate over the
    // manifest frame (pruning-as-a-join), and the only rows the driver
    // collects are the BOUNDARY files, which a clustered layout bounds at
    // O(1) whatever the table size. A range with clean edges collects
    // ZERO paths here; the old implementation collected all 10^5
    // overlapping rows (GB-scale at O(10^7) real files).
    val dir = java.nio.file.Files.createTempDirectory("graft-bigmanifest").toString
    val nFiles = 100000L
    (0L until nFiles).toDF("fid")
      .select(
        concat(lit("synthetic://f"), col("fid")).as("file"),
        lit(10L).as("n_rows"),
        (col("fid") * 10).cast("int").as("min_a"),
        (col("fid") * 10 + 9).cast("int").as("max_a"),
        lit(10L).as("nn_a"))
      .write.mode("overwrite").parquet(s"$dir/t/_manifest")
    // clean-edged range over half the table: every overlapping file is
    // contained → zero boundary files → zero scans of nonexistent paths,
    // and the count is exact from metadata alone
    val (n, inside, scanned) =
      ManifestIndex.countRange(spark, s"$dir/t", "a", 0, nFiles / 2 * 10 - 1)
    assert(n == nFiles / 2 * 10 && inside == nFiles / 2 && scanned == 0)
    // pre-history range: nothing contained, nothing scanned
    assert(ManifestIndex.countRange(spark, s"$dir/t", "a", -5000, -1) ==
      ((0L, 0, 0)))
  }

  test("manifest append folds new files in; untouched buckets byte-stable") {
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest-a").toString
    val w = new TableWriter(dir)
    (0 until 8).foreach { i =>
      Seq((i.toLong, i * 10)).toDF("k", "a")
        .coalesce(1).write.mode("append").parquet(w.path("t"))
    }
    ManifestIndex.build(spark, w.path("t"), Seq("a"))
    val sigsBefore = parquetFileSigs(s"${w.path("t")}/_manifest")
    // two new data files arrive
    val before = new java.io.File(w.path("t")).listFiles
      .map(_.getPath).filter(_.endsWith(".parquet")).toSet
    Seq((100L, 1000), (101L, 1010)).toDF("k", "a")
      .repartition(2).write.mode("append").parquet(w.path("t"))
    val newFiles = new java.io.File(w.path("t")).listFiles
      .map(_.getPath).filter(_.endsWith(".parquet")).toSet -- before
    assert(newFiles.size == 2)
    ManifestIndex.append(spark, w.path("t"), Seq("a"), newFiles.toSeq.sorted)
    // untouched manifest buckets were not rewritten by the append (the
    // manifest stores URI-form paths — derive touched buckets from the
    // manifest's own rows for the new files)
    val sigsAfter = parquetFileSigs(s"${w.path("t")}/_manifest")
    val names = newFiles.map(f => f.substring(f.lastIndexOf('/') + 1))
    val touched = spark.read.parquet(s"${w.path("t")}/_manifest")
      .filter(names.map(n => col("file").endsWith(n)).reduce(_ || _))
      .select(col("mf_bucket").cast("int"))
      .collect().map(_.getInt(0)).toSet
    assert(touched.nonEmpty)
    sigsBefore.foreach { case (p, sig) =>
      val b = p.split('/').find(_.startsWith("mf_bucket="))
        .get.stripPrefix("mf_bucket=").toInt
      if (!touched.contains(b))
        assert(sigsAfter.get(p).contains(sig),
          s"append rewrote untouched manifest bucket $p")
    }
    // incremental == rebuild, file for file
    val inc = spark.read.parquet(s"${w.path("t")}/_manifest")
      .select("file", "n_rows", "min_a", "max_a", "nn_a")
      .collect().map(_.toSeq).toSet
    // re-appending the same files is refused (double counting)
    intercept[IllegalArgumentException] {
      ManifestIndex.append(spark, w.path("t"), Seq("a"), newFiles.toSeq)
    }
    ManifestIndex.build(spark, w.path("t"), Seq("a"))
    val full = spark.read.parquet(s"${w.path("t")}/_manifest")
      .select("file", "n_rows", "min_a", "max_a", "nn_a")
      .collect().map(_.toSeq).toSet
    assert(inc == full)
  }

  test("a file with all-null bounds is dropped — sound for null-rejecting predicates") {
    val dir = java.nio.file.Files.createTempDirectory("graft-manifest-n").toString
    val w = new TableWriter(dir)
    Seq((1L, Some(5)), (2L, Some(7))).toDF("k", "x")
      .coalesce(1).write.parquet(w.path("t"))
    Seq((3L, None: Option[Int]), (4L, None: Option[Int])).toDF("k", "x")
      .coalesce(1).write.mode("append").parquet(w.path("t"))
    ManifestIndex.build(spark, w.path("t"), Seq("x"))
    val files = ManifestIndex.prunedFiles(spark, w.path("t"), Seq(("x", 0, 100)))
    assert(files.size == 1, "the all-null file must be pruned")
    val got = ManifestIndex.readPruned(spark, w.path("t"), Seq(("x", 0, 100)))
      .filter(col("x").between(0, 100)).select("k").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // identical to the unpruned filtered scan
  }
}
