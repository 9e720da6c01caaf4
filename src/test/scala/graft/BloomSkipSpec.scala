package graft

import org.apache.spark.sql.functions._
import graft.sources.ManifestIndex

/** Per-file bloom manifest (q124): point-lookup skipping on a column
  * where min/max pruning is useless. Pins: zero false negatives (every
  * file that truly holds a probed value survives pruning), real pruning
  * power on scattered values (survivors ≪ files), the absent-value
  * case (rarely any file survives; the residual filter keeps the
  * answer exact either way), multi-value probes as unions, and that
  * min/max pruning on the same column indeed keeps everything (the
  * motivation).
  */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  private val numBits = 1 << 16 // 64 Ki bits
  private val numHashes = 5

  private lazy val table = {
    val d = java.nio.file.Files.createTempDirectory("bloomskip").toFile
    d.deleteOnExit()
    val path = d.getPath + "/t"
    // v is a high-cardinality pseudo-random derivation of k — every
    // file's [min_v, max_v] spans essentially the whole domain
    (1 to 20000).map { i =>
      (i.toLong, (i.toLong * 2654435761L) % 1000000007L)
    }.toDF("k", "v")
      .repartition(10, col("k"))
      .write.mode("overwrite").parquet(path)
    ManifestIndex.build(spark, path, Seq("v"))
    ManifestIndex.buildBloom(spark, path, "v", numBits, numHashes)
    path
  }

  private def fileOf(vs: Seq[Long]): Map[Long, String] =
    spark.read.parquet(table)
      .filter(col("v").isin(vs: _*))
      .select(col("v"), col("_metadata.file_path").as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("min/max pruning keeps every file on the scattered column (the motivation)") {
    val v = (77L * 2654435761L) % 1000000007L
    val survivors = ManifestIndex.prunedFiles(spark, table, Seq(("v", v, v)))
    assert(survivors.size === 10, "every file's range spans the domain")
  }

  test("zero false negatives: the owning file always survives, and pruning is real") {
    val probes = Seq(3L, 1234L, 9999L, 17777L).map(i => (i * 2654435761L) % 1000000007L)
    val owners = fileOf(probes)
    assert(owners.size === probes.size)
    var totalSurvivors = 0
    probes.foreach { v =>
      val survivors = ManifestIndex
        .bloomPrunedFiles(spark, table, "v", Seq(v), numBits, numHashes)
      assert(survivors.contains(owners(v)),
        s"file holding $v was wrongly pruned")
      totalSurvivors += survivors.size
    }
    // 64Ki bits over ~2k rows/file → fpp ≪ 1%; demand well under half
    assert(totalSurvivors <= probes.size * 3,
      s"pruning power lost: $totalSurvivors survivors for ${probes.size} probes")
  }

  test("absent values prune to (almost) nothing and read back empty") {
    val absent = Seq(-5L, 123456789012L)
    val (frame, scanned) = ManifestIndex
      .readBloomPruned(spark, table, "v", absent, numBits, numHashes)
    assert(scanned <= 2, s"absent values should rarely survive, scanned $scanned")
    assert(frame.count() === 0L, "residual filter keeps the answer exact")
  }

  test("multi-value probe = union of survivors; residual read equals the plain lookup") {
    val probes = Seq(11L, 222L, 4444L).map(i => (i * 2654435761L) % 1000000007L)
    val (frame, scanned) = ManifestIndex
      .readBloomPruned(spark, table, "v", probes, numBits, numHashes)
    val got = frame.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = spark.read.parquet(table).filter(col("v").isin(probes: _*))
      .select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === exp)
    assert(scanned < 10, "the union probe must still prune")
    assert(exp.size === 3)
  }

  test("incremental bloom append == rebuild; untouched buckets byte-stable; dupes refused") {
    val d = java.nio.file.Files.createTempDirectory("bloomapp").toFile
    d.deleteOnExit()
    val path = d.getPath + "/t"
    def mk(ids: Range) = ids.map { i =>
      (i.toLong, (i.toLong * 2654435761L) % 1000000007L)
    }.toDF("k", "v")
    mk(1 to 8000).repartition(4, col("k"))
      .write.mode("overwrite").parquet(path)
    ManifestIndex.buildBloom(spark, path, "v", numBits, numHashes)
    // new files arrive (appended data), bloom folds them incrementally
    val before = parquetFileSigs(s"$path/_bloom_v")
    mk(8001 to 10000).repartition(2, col("k"))
      .write.mode("append").parquet(path)
    val all = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .map(_.getAbsolutePath).toSeq
    val preexisting = spark.read.parquet(s"$path/_bloom_v")
      .select("file").collect().map(_.getString(0)).toSet
    val newFiles = all.filterNot(f => preexisting.exists(_.endsWith(f.split("/").last)))
    assert(newFiles.size === 2)
    ManifestIndex.appendBloom(spark, path, "v", newFiles, numBits, numHashes)
    // the appended manifest must serve like a rebuild: probe a value
    // living in a NEW file and one in an OLD file — both owners survive
    val vNew = (9000L * 2654435761L) % 1000000007L
    val vOld = (100L * 2654435761L) % 1000000007L
    val owners = fileOfIn(path, Seq(vNew, vOld))
    Seq(vNew, vOld).foreach { v =>
      val survivors = ManifestIndex
        .bloomPrunedFiles(spark, path, "v", Seq(v), numBits, numHashes)
      assert(survivors.contains(owners(v)),
        s"owner of $v missing after incremental append")
    }
    // untouched-bucket byte-stability: every pre-append manifest file
    // still present, byte-identical
    val after = parquetFileSigs(s"$path/_bloom_v")
    assert(before.forall { case (f, sig) => after.get(f).contains(sig) },
      "pre-append bloom manifest files must stay byte-identical")
    // re-appending the same files is refused
    val err = intercept[IllegalArgumentException] {
      ManifestIndex.appendBloom(spark, path, "v", newFiles, numBits, numHashes)
    }
    assert(err.getMessage.contains("already present"))
  }

  private def fileOfIn(path: String, vs: Seq[Long]): Map[Long, String] =
    spark.read.parquet(path)
      .filter(col("v").isin(vs: _*))
      .select(col("v"), col("_metadata.file_path").as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("the sparse word map agrees with the driver-side position chain") {
    val v = (500L * 2654435761L) % 1000000007L
    val owner = fileOf(Seq(v))(v)
    val bloomRow = spark.read.parquet(s"$table/_bloom_v")
      .filter(col("file") === owner).head()
    val words = bloomRow.getMap[Int, Long](bloomRow.fieldIndex("bloom"))
    (0 until numHashes).foreach { i =>
      val p = graft.functions.Bloom.position(v, i, numBits)
      val w = words.get(p / 64).getOrElse(0L)
      assert((w & (1L << (p % 64))) !== 0L,
        s"bit $p for hash $i not set in the owning file's bloom")
    }
  }
}
