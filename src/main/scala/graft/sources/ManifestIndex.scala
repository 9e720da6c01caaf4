package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max manifest for data skipping on plain parquet — the
  * read-side complement of Z-order clustering
  * ([[graft.functions.ZOrder]]): what Iceberg/Delta keep in their
  * manifests, maintained here as a `_manifest` parquet dataset INSIDE
  * the table directory (underscore-prefixed, so plain readers ignore
  * it). One distributed pass builds it: group rows by
  * `_metadata.file_path` (a codegen'd hidden column, no UDF) and keep
  * per-file row counts and per-column min/max in their native types.
  *
  * Query-time skipping reads the (tiny) manifest, keeps files whose
  * [min, max] interval overlaps every requested bound, and scans only
  * those — the driver collects just the surviving file list, the same
  * order of magnitude as the file listing any parquet scan already
  * builds driver-side. On a clustered table a two-sided rectangle
  * predicate prunes most files (spec-asserted); the pruned read is a
  * SUPERSET of the answer, so callers re-apply the exact predicate as
  * a residual filter (q74 does; the oracle pins the composition).
  *
  * Null semantics: per-file min/max ignore nulls (like parquet's own
  * row-group stats), and a file whose every value is null carries null
  * bounds and is DROPPED by overlap pruning — correct precisely
  * because range predicates reject NULL; a predicate that matches
  * nulls (IS NULL) must not use bounds pruning.
  */
object ManifestIndex {

  private def manifestPath(tablePath: String) = s"$tablePath/_manifest"

  private def statAggs(cols: Seq[String]) = cols.flatMap { c =>
    Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"),
      count(col(c)).as(s"nn_$c")) // non-null count, for metadata-only aggs
  }

  /** Build (or rebuild) the manifest for `cols`, one pass over the
    * table. The manifest is partitioned by `mf_bucket =
    * pmod(xxhash64(file), buckets)` — sharded the way mergeByKey shards
    * its tables, so a 10⁷-file manifest neither funnels through one
    * write task at build time nor rewrites wholesale when [[append]]
    * folds a new batch of files in (only the new files' buckets are
    * touched). Readers scan the whole (tiny relative to the data)
    * manifest regardless of bucketing. Size `buckets` to the file
    * count like mergeByKey sizes `__bucket` to the table.
    */
  def build(spark: SparkSession, tablePath: String,
      cols: Seq[String], buckets: Int = 16): String = {
    require(cols.nonEmpty, "manifest needs at least one column")
    spark.read.parquet(tablePath)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(count(lit(1)).as("n_rows"), statAggs(cols): _*)
      .withColumn("mf_bucket",
        pmod(xxhash64(col("file")), lit(buckets.toLong)).cast("int"))
      .repartition(col("mf_bucket")) // one file per bucket dir
      .write.mode("overwrite").partitionBy("mf_bucket")
      .parquet(manifestPath(tablePath))
    manifestPath(tablePath)
  }

  /** Incrementally fold NEW data files into an existing manifest: stats
    * are computed over just those files and appended into the bucketed
    * layout — cost tracks the batch, untouched manifest buckets stay
    * byte-stable (ManifestSkipSpec). `cols` and `buckets` must match
    * the build. Files already present are refused (appending them would
    * double their contribution to metadata-only counts).
    */
  def append(spark: SparkSession, tablePath: String, cols: Seq[String],
      newFiles: Seq[String], buckets: Int = 16): String = {
    require(cols.nonEmpty, "manifest needs at least one column")
    require(newFiles.nonEmpty, "append needs at least one file")
    val stats = spark.read.parquet(newFiles: _*)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(count(lit(1)).as("n_rows"), statAggs(cols): _*)
      .withColumn("mf_bucket",
        pmod(xxhash64(col("file")), lit(buckets.toLong)).cast("int"))
    // presence guard, pruned to the batch's buckets (bounded collect:
    // ≤ buckets ids, then a semi-join probe on the pruned manifest)
    val touched = stats.select("mf_bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    val clash = spark.read.parquet(manifestPath(tablePath))
      .withColumn("mf_bucket", col("mf_bucket").cast("int"))
      .filter(col("mf_bucket").isin(touched.toIndexedSeq: _*))
      .join(stats.select("file"), Seq("file"), "left_semi")
      .limit(1).collect()
    require(clash.isEmpty,
      s"manifest append: file already present: ${clash.headOption
        .map(_.get(0)).getOrElse("")}")
    stats.repartition(col("mf_bucket"))
      .write.mode("append").partitionBy("mf_bucket")
      .parquet(manifestPath(tablePath))
    manifestPath(tablePath)
  }

  /** Files whose per-column [min, max] interval overlaps EVERY
    * `(column, lo, hi)` bound (inclusive). Bounded collect: only the
    * surviving file paths.
    */
  def prunedFiles(spark: SparkSession, tablePath: String,
      bounds: Seq[(String, Any, Any)]): Seq[String] = {
    require(bounds.nonEmpty, "skipping needs at least one bound")
    val overlap = bounds.map { case (c, lo, hi) =>
      col(s"min_$c") <= lit(hi) && col(s"max_$c") >= lit(lo)
    }.reduce(_ && _)
    spark.read.parquet(manifestPath(tablePath))
      .filter(overlap).select("file")
      .collect().map(_.getString(0)).toSeq
  }

  /** Metadata-only range count — scan elision, the aggregation analogue
    * of file skipping: `COUNT(*) WHERE c BETWEEN lo AND hi` is answered
    * from the manifest alone for every file whose [min, max] sits fully
    * inside the range (its contribution is the per-file non-null count;
    * nulls never match a range predicate), and only BOUNDARY files —
    * the ones the range cuts through — are actually scanned. On a
    * range-clustered 100 TB table a year-long count touches two
    * boundary files instead of the year. Returns
    * (count, metadataOnlyFiles, scannedFiles).
    *
    * Scale shape (Iceberg-style distributed manifest evaluation): the
    * CONTAINED files' contribution is a distributed aggregate over the
    * manifest — the driver never materializes the contained file list,
    * which at 100 TB is O(10⁷) paths. Only the BOUNDARY file paths are
    * collected, and on a range-clustered table the range cuts through
    * O(1) files regardless of table size (a year-long range has two
    * boundaries however many files the year spans).
    */
  def countRange(spark: SparkSession, tablePath: String, c: String,
      lo: Any, hi: Any): (Long, Int, Int) = {
    val m = spark.read.parquet(manifestPath(tablePath))
    val contained = col(s"min_$c") >= lit(lo) && col(s"max_$c") <= lit(hi)
    val overlaps = col(s"min_$c") <= lit(hi) && col(s"max_$c") >= lit(lo)
    // contained files: pruning-as-an-aggregate, nothing collected but the sum
    val metaRow = m.filter(overlaps && contained)
      .agg(coalesce(sum(col(s"nn_$c").cast("long")), lit(0L)).as("meta"),
        count(lit(1)).as("n"))
      .head()
    val (metaCount, insideN) = (metaRow.getLong(0), metaRow.getLong(1))
    // bounded collect: boundary files only — O(1) on a clustered table
    val boundary = m.filter(overlaps && !contained)
      .select(col("file")).collect().map(_.getString(0))
    val scanned =
      if (boundary.isEmpty) 0L
      else spark.read.parquet(boundary.toIndexedSeq: _*)
        .filter(col(c) >= lit(lo) && col(c) <= lit(hi)).count()
    (metaCount + scanned, insideN.toInt, boundary.length)
  }

  /** Scan only the files the manifest can't rule out. The result is a
    * superset of rows matching the bounds — apply the exact predicate
    * as a residual filter. Returns an empty frame (schema preserved)
    * when every file is pruned.
    */
  def readPruned(spark: SparkSession, tablePath: String,
      bounds: Seq[(String, Any, Any)]): DataFrame = {
    val files = prunedFiles(spark, tablePath, bounds)
    if (files.isEmpty) {
      val schema = spark.read.parquet(tablePath).schema
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else spark.read.parquet(files: _*)
  }

  // ---------------------------------------------------------------------
  // Per-file BLOOM manifest — point-lookup skipping where min/max can't
  // help: on a high-cardinality column whose values are SCATTERED
  // across files (the usual fate of every column the table is not
  // clustered by), every file's [min, max] spans the domain and range
  // pruning keeps everything; a per-file bloom keeps only the files
  // that might contain the probed value — expected survivors
  // 1 + fpp·(F−1) however many files the table holds. This is the
  // Iceberg/Parquet bloom complement of the min/max stats above,
  // maintained as `_bloom_<col>` beside `_manifest`.

  private def bloomPath(tablePath: String, c: String) =
    s"$tablePath/_bloom_$c"

  /** Build the per-file bloom manifest for integral column `c` in ONE
    * distributed pass: each row expands in-row to its `numHashes` bit
    * positions (the codegen'd [[graft.functions.BloomPositions]] — the
    * exact expansion the q81 join-filter build uses, so build and
    * probe agree by construction), positions fold to per-(file, word)
    * masks by `bit_or` (map-side combined), and each file keeps a
    * SPARSE word map (only set words are stored — a file whose rows
    * touch w distinct words costs w map entries, never numBits/64).
    * Layout is bucketed by file hash like the stats manifest.
    */
  def buildBloom(spark: SparkSession, tablePath: String, c: String,
      numBits: Int, numHashes: Int, buckets: Int = 16): String = {
    require(numBits % 64 == 0 && numBits > 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    import org.apache.spark.sql.GraftExpressionBridge.{column => gcol, expression => gexpr}
    val pos = gcol(graft.functions.BloomPositions(
      gexpr(col(c).cast("long")), numHashes, numBits))
    spark.read.parquet(tablePath)
      .select(col("_metadata.file_path").as("file"), explode(pos).as("p"))
      .select(col("file"), (col("p") / 64).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))").as("mask"))
      .groupBy(col("file"), col("word"))
      .agg(bit_or(col("mask")).as("bits"))
      .groupBy(col("file"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("bits"))))
        .as("bloom"))
      .withColumn("mf_bucket",
        pmod(xxhash64(col("file")), lit(buckets.toLong)).cast("int"))
      .repartition(col("mf_bucket"))
      .write.mode("overwrite").partitionBy("mf_bucket")
      .parquet(bloomPath(tablePath, c))
    bloomPath(tablePath, c)
  }

  /** Incrementally fold NEW data files into an existing bloom manifest —
    * the bloom twin of [[append]]: word maps are computed over just the
    * new files and appended into the bucketed layout (cost tracks the
    * batch; untouched manifest buckets stay byte-stable). Files already
    * present are refused. `numBits`/`numHashes` must match the build.
    */
  def appendBloom(spark: SparkSession, tablePath: String, c: String,
      newFiles: Seq[String], numBits: Int, numHashes: Int,
      buckets: Int = 16): String = {
    require(newFiles.nonEmpty, "appendBloom needs at least one file")
    import org.apache.spark.sql.GraftExpressionBridge.{column => gcol, expression => gexpr}
    val pos = gcol(graft.functions.BloomPositions(
      gexpr(col(c).cast("long")), numHashes, numBits))
    val blooms = spark.read.parquet(newFiles: _*)
      .select(col("_metadata.file_path").as("file"), explode(pos).as("p"))
      .select(col("file"), (col("p") / 64).cast("int").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))").as("mask"))
      .groupBy(col("file"), col("word"))
      .agg(bit_or(col("mask")).as("bits"))
      .groupBy(col("file"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("bits"))))
        .as("bloom"))
      .withColumn("mf_bucket",
        pmod(xxhash64(col("file")), lit(buckets.toLong)).cast("int"))
    // presence guard, pruned to the batch's buckets (bounded collect)
    val touched = blooms.select("mf_bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    val clash = spark.read.parquet(bloomPath(tablePath, c))
      .withColumn("mf_bucket", col("mf_bucket").cast("int"))
      .filter(col("mf_bucket").isin(touched.toIndexedSeq: _*))
      .join(blooms.select("file"), Seq("file"), "left_semi")
      .limit(1).collect()
    require(clash.isEmpty,
      s"bloom append: file already present: ${clash.headOption
        .map(_.get(0)).getOrElse("")}")
    blooms.repartition(col("mf_bucket"))
      .write.mode("append").partitionBy("mf_bucket")
      .parquet(bloomPath(tablePath, c))
    bloomPath(tablePath, c)
  }

  /** Files that might contain ANY of `values` in column `c`: for each
    * value the k bit positions are computed driver-side (the same
    * [[graft.functions.Bloom.position]] chain the build expanded) and
    * tested against the sparse word map — an absent word is an unset
    * word. Zero false negatives by construction; false positives are
    * filtered by the caller's residual predicate. Bounded collect:
    * only surviving file paths. `numBits`/`numHashes` must match the
    * build.
    */
  def bloomPrunedFiles(spark: SparkSession, tablePath: String, c: String,
      values: Seq[Long], numBits: Int, numHashes: Int): Seq[String] = {
    require(values.nonEmpty, "bloom probe needs at least one value")
    val anyValue = values.map { v =>
      (0 until numHashes).map { i =>
        val p = graft.functions.Bloom.position(v, i, numBits)
        coalesce(element_at(col("bloom"), lit(p / 64)), lit(0L))
          .bitwiseAND(lit(1L << (p % 64))) =!= lit(0L)
      }.reduce(_ && _)
    }.reduce(_ || _)
    spark.read.parquet(bloomPath(tablePath, c))
      .filter(anyValue).select("file")
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** Point-lookup read through the bloom manifest: scan only files
    * that might contain one of `values`, re-apply the exact predicate
    * as a residual. Returns (frame, filesScanned).
    */
  def readBloomPruned(spark: SparkSession, tablePath: String, c: String,
      values: Seq[Long], numBits: Int, numHashes: Int): (DataFrame, Int) = {
    val files = bloomPrunedFiles(spark, tablePath, c, values, numBits, numHashes)
    val frame =
      if (files.isEmpty) {
        val schema = spark.read.parquet(tablePath).schema
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      } else spark.read.parquet(files: _*)
    (frame.filter(col(c).isin(values: _*)), files.length)
  }
}
