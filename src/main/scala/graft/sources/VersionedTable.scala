package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IndexProtocol

/** Multi-version merge tables: the transaction-log layer over the
  * [[TableWriter.mergeByKey]] bucket layout (the Delta-log/Iceberg-
  * snapshot analogue, built from the same primitives the index families'
  * exactly-once protocols use — atomic manifest writes, writer leases,
  * staged-file-manifest redo).
  *
  * Why it exists: plain `mergeByKey` swaps bucket directories in place —
  * correct for a single writer with quiescent readers, but a reader
  * overlapping a multi-bucket merge can see bucket 3 NEW while bucket 7
  * is still OLD (a torn cross-bucket state), or a briefly-missing bucket
  * mid-rename; and two concurrent writers collide on the shared stage
  * dir silently. The snapshot-isolation work (q112–q114) closed exactly
  * this hazard for the three serving-index families; this class closes
  * it for the table layer.
  *
  * Layout under the table root:
  * {{{
  *   __bucket=<b>/v<N>-<i>.parquet     // generation-stamped, immutable
  *   _commits/v_<N>                    // version manifest: "<b>\t<file>"
  *   _commits/writer                   // single-writer lease
  *   _commits/staged_<N>               // in-flight commit's redo manifest
  * }}}
  *
  * Commit protocol (merge or delete), per version `N+1`:
  *   1. acquire the writer lease (same id re-acquires; different id
  *      fails loudly — no second writer can interleave);
  *   2. sweep crashed attempts: any `staged_<k>` without a `v_<k>`
  *      manifest names exactly the files that attempt may have moved in
  *      — delete them (O(attempt), no directory listing);
  *   3. read the CURRENT committed state (manifest-resolved, touched
  *      buckets only) and compute the merged/surviving rows;
  *   4. stage the touched buckets, move them in under `v<N+1>-` names
  *      guarded by `staged_<N+1>` ([[IndexProtocol.moveStagedIn]]);
  *      new files are invisible — no reader resolves them until…
  *   5. …the version manifest `v_<N+1>` (touched buckets' new files +
  *      untouched buckets' entries carried over verbatim) is renamed in
  *      ATOMICALLY. This is the commit point: readers see v_N exactly,
  *      or v_{N+1} exactly, never a mix;
  *   6. drop the staged manifest.
  *
  * Readers ([[read]]) resolve a version manifest to an exact file list —
  * no directory listing, no globbing — so a commit racing the read is
  * invisible (old files are immutable and survive until [[vacuum]]).
  * `asOf` pins any retained version: time travel is a different manifest,
  * zero extra storage beyond the superseded generations vacuum hasn't
  * reclaimed. Untouched buckets are carried over as manifest ENTRIES, so
  * an incremental commit never re-lists, re-reads, or re-writes them.
  *
  * Scale notes (the 100 TB shape): commit data cost tracks touched-
  * bucket volume (the mergeByKey sizing rule: grow bucket count with the
  * table to hold bucket volume constant); commit METADATA cost tracks
  * touched buckets too — ordinary commits write DELTA manifests
  * (`!bucket` drops + the touched buckets' new entries, untouched
  * buckets carried implicitly), with a FULL checkpoint every
  * [[checkpointEvery]] versions bounding read-side resolution to
  * checkpoint + ≤`checkpointEvery` tail deltas (the commit-marker-
  * compaction pattern applied to manifests; at 10⁷ live files a
  * one-bucket commit writes bytes proportional to ONE bucket, not
  * 600 MB). [[vacuum]] re-anchors the retention floor as a checkpoint
  * before dropping older manifests, so every retained version stays
  * resolvable. Every manifest records the version's schema DDL, which
  * is also what makes a legally EMPTY version (delete-all) readable.
  * Reads with `mergeSchema` touch every file's footer once; a
  * deployment past that serves the scan schema from the manifest's
  * recorded DDL directly (as table formats do).
  */
object VersionedTable {

  /** Test-only crash injection points, mirroring IndexRestartSpec's
    * protocol-faithful injectors: each hook runs at the named protocol
    * step; a throwing hook simulates a crash there.
    */
  private[graft] final case class CommitHooks(
      beforeMove: () => Unit = () => (),
      beforeManifest: () => Unit = () => ())
  private[graft] object CommitHooks { val none: CommitHooks = CommitHooks() }

  private def commitsDir(root: Path) = new Path(root, "_commits")
  private def manifestPath(root: Path, v: Long) =
    new Path(commitsDir(root), s"v_$v")
  private def stagedPath(root: Path, v: Long) =
    new Path(commitsDir(root), s"staged_$v")

  private def fsOf(spark: SparkSession, root: Path): FileSystem =
    root.getFileSystem(spark.sessionState.newHadoopConf())

  /** Committed version ids, ascending (empty for a table never
    * committed).
    */
  def versions(spark: SparkSession, rootStr: String): Seq[Long] = {
    val root = new Path(rootStr)
    val fs = fsOf(spark, root)
    val cd = commitsDir(root)
    if (!fs.exists(cd)) Nil
    else fs.listStatus(cd).map(_.getPath.getName).toSeq
      .filter(_.startsWith("v_"))
      .flatMap(n => scala.util.Try(n.stripPrefix("v_").toLong).toOption)
      .sorted
  }

  def latestVersion(spark: SparkSession, rootStr: String): Option[Long] =
    versions(spark, rootStr).lastOption

  /** One parsed manifest file. Three on-disk forms:
    *   - legacy (r10): no header, every line `<b>\t<path>` — a FULL
    *     snapshot of the live file set;
    *   - `#graft.v2 full schema=<ddl>`: same body, plus the table's
    *     schema at that version (what makes an EMPTY version readable);
    *   - `#graft.v2 delta schema=<ddl>`: O(touched) lines only —
    *     `!<b>` for each bucket this commit REWROTE (drop its prior
    *     entries; a fully-emptied bucket has `!b` and no adds) followed
    *     by the touched buckets' new `<b>\t<path>` entries. Untouched
    *     buckets are carried IMPLICITLY — never re-listed, re-read, or
    *     re-written, so commit metadata cost tracks touched buckets,
    *     not total live files (the r10 verdict's 600 MB-manifest fix).
    */
  private final case class Manifest(isFull: Boolean, schemaDdl: Option[String],
      rewritten: Set[Int], entries: Map[Int, Seq[String]])

  /** Parsed-manifest cache. Manifest files are WRITE-ONCE per (root,
    * version) — committed via atomic rename, never modified in place —
    * so a parse can be reused as long as the file on disk is provably
    * the same one (modificationTime + length re-validated on EVERY hit;
    * a vacuumed manifest misses loudly via getFileStatus, a recreated
    * table at the same path misses via the changed mtime). This is the
    * Delta/Iceberg snapshot-cache analogue: without it every snapshot
    * read, CDF batch plan, and conflict check re-reads the whole delta
    * chain file-by-file — O(chain) opens per resolve, quadratic over a
    * stream's lifetime. Validation is metadata-only, so resolves cost
    * one getFileStatus per chain element instead of open+read+parse.
    */
  private val manifestCache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long), (Long, Long, Manifest)]()

  private[graft] def clearManifestCache(): Unit = manifestCache.clear()

  private def parseManifestCached(fs: FileSystem, root: Path,
      v: Long): Manifest = {
    val mf = manifestPath(root, v)
    val st =
      try fs.getFileStatus(mf)
      catch {
        case _: java.io.FileNotFoundException =>
          manifestCache.remove((root.toString, v))
          throw new IllegalArgumentException(
            s"no manifest for version $v under $root")
      }
    val key = (root.toString, v)
    val cur = manifestCache.get(key)
    if (cur != null && cur._1 == st.getModificationTime
        && cur._2 == st.getLen) cur._3
    else {
      val m = parseManifest(fs, root, v)
      if (manifestCache.size > 4096) manifestCache.clear() // bound, not LRU
      manifestCache.put(key, (st.getModificationTime, st.getLen, m))
      m
    }
  }

  private def parseManifest(fs: FileSystem, root: Path, v: Long): Manifest = {
    val mf = manifestPath(root, v)
    val lines = IndexProtocol.readLinesIfExists(fs, mf).getOrElse(
      throw new IllegalArgumentException(
        s"no manifest for version $v under $root"))
      .filter(_.nonEmpty)
    val (isFull, schema, body) = lines.headOption match {
      case Some(h) if h.startsWith("#graft.v2 ") =>
        val rest = h.stripPrefix("#graft.v2 ")
        val kind = rest.takeWhile(_ != ' ')
        val ddl = rest.drop(kind.length + 1).stripPrefix("schema=")
        (kind == "full", Some(ddl).filter(_.nonEmpty), lines.tail)
      case _ => (true, None, lines) // legacy: full, schema-less
    }
    val rewritten = body.filter(_.startsWith("!"))
      .map(_.stripPrefix("!").toInt).toSet
    val entries = body.filterNot(_.startsWith("!")).map { l =>
      val Array(b, p) = l.split("\t", 2); (b.toInt, p)
    }.groupBy(_._1).map { case (b, ps) => b -> ps.map(_._2) }
    Manifest(isFull, schema, rewritten, entries)
  }

  /** Live per-bucket files of version `v`, resolved through the delta
    * chain: walk back to the nearest full checkpoint (the chain is
    * contiguous by construction — commits increment by one and
    * [[vacuum]] re-anchors the retention floor as a checkpoint before
    * dropping older manifests), then apply each delta ascending.
    * Returns the entries plus the version's schema DDL (the latest
    * manifest's — each commit records the merged schema).
    */
  private def resolveManifest(fs: FileSystem, root: Path,
      v: Long): (Map[Int, Seq[String]], Option[String]) = {
    var chain = List(parseManifestCached(fs, root, v))
    var i = v
    while (!chain.head.isFull) {
      i -= 1
      require(i >= 0, s"delta chain of version $v under $root reaches " +
        "below version 0 without a full checkpoint — corrupt manifest set")
      chain ::= parseManifestCached(fs, root, i)
    }
    val entries = chain.foldLeft(Map.empty[Int, Seq[String]]) { (acc, m) =>
      (acc -- m.rewritten) ++ m.entries
    }
    (entries, chain.last.schemaDdl)
  }

  /** Per-bucket committed files of version `v` (delta-resolved). */
  private def manifestEntries(fs: FileSystem, root: Path,
      v: Long): Map[Int, Seq[String]] = resolveManifest(fs, root, v)._1

  /** Test hook: resolved (bucket → files) view of a committed version. */
  private[graft] def resolvedEntries(spark: SparkSession, rootStr: String,
      v: Long): Map[Int, Seq[String]] = {
    val root = new Path(rootStr)
    manifestEntries(fsOf(spark, root), root, v)
  }

  /** Manifest-recorded schema DDL of a committed version (None on
    * legacy schema-less manifests) plus the resolved entries — what the
    * streaming CDF source ([[graft.streaming.VtCdfStream]]) plans from
    * without reading any data file.
    */
  private[graft] def resolvedWithSchema(spark: SparkSession, rootStr: String,
      v: Long): (Map[Int, Seq[String]], Option[String]) = {
    val root = new Path(rootStr)
    resolveManifest(fsOf(spark, root), root, v)
  }

  /** Snapshot read of the table at `asOf` (default: latest committed).
    * Resolves the version manifest to an exact file list — concurrent
    * commits are invisible, torn states unobservable. Reading a
    * vacuumed version refuses loudly, naming the retained floor.
    * `buckets` restricts to those bucket ids (the pruned read the
    * commit paths use). `mergeSchema` spans schema evolution: files
    * older than an additive column null-fill it.
    */
  def read(spark: SparkSession, rootStr: String,
      asOf: Option[Long] = None,
      buckets: Option[Seq[Int]] = None): DataFrame = {
    val root = new Path(rootStr)
    val fs = fsOf(spark, root)
    val vs = versions(spark, rootStr)
    require(vs.nonEmpty, s"versioned table $rootStr has no committed version")
    val v = asOf match {
      case None => vs.last
      case Some(a) =>
        require(vs.contains(a),
          s"version $a of $rootStr is not available " +
            s"(retained: ${vs.mkString(", ")} — older versions were vacuumed)")
        a
    }
    val (entries, schemaDdl) = resolveManifest(fs, root, v)
    val selected = buckets match {
      case Some(bs) => entries.filter { case (b, _) => bs.contains(b) }
      case None => entries
    }
    val files = selected.toSeq.flatMap(_._2).sorted
    if (files.isEmpty) {
      // none of the selected buckets exist at this version — empty
      // frame with the table schema: from the manifest's recorded DDL
      // (which also makes a LEGALLY EMPTY version readable — a
      // delete-all commit used to wedge the table on `has no files`),
      // else from any committed file (legacy manifests)
      schemaDdl match {
        case Some(ddl) =>
          spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
            org.apache.spark.sql.types.StructType.fromDDL(ddl))
            .withColumn("__bucket", col("__bucket").cast("int"))
        case None =>
          val any = entries.toSeq.flatMap(_._2).sorted
          require(any.nonEmpty,
            s"version $v of $rootStr has no files and no recorded schema " +
              "(legacy empty manifest)")
          spark.read.option("basePath", rootStr).parquet(any.head).limit(0)
            .withColumn("__bucket", col("__bucket").cast("int"))
      }
    } else {
      spark.read.option("basePath", rootStr)
        .option("mergeSchema", "true")
        .parquet(files: _*)
        .withColumn("__bucket", col("__bucket").cast("int"))
    }
  }

  /** Sweep every crashed attempt: a `staged_<k>` whose `v_<k>` manifest
    * never committed names exactly the files that attempt moved in.
    * (A `staged_<k>` WITH a committed `v_<k>` is cleanup litter from a
    * crash after the commit point — the staged file is dropped, the
    * data files are live.)
    */
  private def sweepCrashed(fs: FileSystem, root: Path): Unit = {
    val cd = commitsDir(root)
    if (!fs.exists(cd)) return
    val names = fs.listStatus(cd).map(_.getPath.getName).toSet
    // optimistic writers' markers (staged_occ_<writerId>) are NOT
    // crashes from this path's perspective — they may be live in-flight
    // commits; the leased paths refuse to run while any exist (mode
    // check below), and [[sweepOwnOcc]]/[[sweepOcc]] handle them by
    // reference
    names.filter(n => n.startsWith("staged_") && !n.startsWith("staged_occ_"))
      .foreach { n =>
        val k = n.stripPrefix("staged_")
        if (!names.contains(s"v_$k"))
          IndexProtocol.redoFromManifest(fs, new Path(cd, n))
        fs.delete(new Path(cd, n), false)
      }
  }

  /** Names of in-flight/crashed optimistic markers under the table. */
  private def occMarkers(fs: FileSystem, root: Path): Seq[String] = {
    val cd = commitsDir(root)
    if (!fs.exists(cd)) Nil
    else fs.listStatus(cd).map(_.getPath.getName).toSeq
      .filter(_.startsWith("staged_occ_")).sorted
  }

  /** The leased single-writer paths refuse while optimistic markers
    * exist: a leased writer's crash sweep and version allocation both
    * assume exclusivity, and an optimistic writer may be live. A marker
    * from a KNOWN-DEAD optimistic writer is cleared with [[sweepOcc]].
    */
  private def assertNoOcc(fs: FileSystem, root: Path, what: String): Unit = {
    val ms = occMarkers(fs, root)
    require(ms.isEmpty,
      s"$what: optimistic commit marker(s) ${ms.mkString(", ")} present — " +
        "the table is being written in optimistic mode (or an optimistic " +
        "writer crashed). Leased and optimistic commits never mix; for a " +
        "dead optimistic writer run VersionedTable.sweepOcc first.")
  }

  /** Clear a DEAD optimistic writer's marker: files it moved in are
    * kept if any retained manifest references them (the crash was
    * post-commit) and deleted otherwise, exactly like the writer's own
    * startup sweep. Only safe once that writer is decommissioned.
    */
  def sweepOcc(spark: SparkSession, rootStr: String, writerId: String): Unit = {
    val root = new Path(rootStr)
    val fs = fsOf(spark, root)
    sweepOwnOcc(fs, root, rootStr, spark, writerId)
  }

  /** Upsert `incoming` by `key` as one atomic committed version.
    * Same merge semantics as [[TableWriter.mergeByKey]] (incoming wins,
    * or an associative `resolveOrder` argmax; at most one incoming row
    * per key), same touched-bucket cost — plus the commit protocol
    * above. Returns the committed version id. Additive schema
    * evolution is supported: an incoming frame with new columns
    * null-fills existing rows (old files stay byte-stable; reads
    * mergeSchema across generations).
    */
  def commitMerge(spark: SparkSession, rootStr: String, incoming: DataFrame,
      key: String, numBuckets: Int = 16, writerId: String = "default",
      resolveOrder: Seq[Column] = Nil,
      hooks: CommitHooks = CommitHooks.none,
      leaseTtlMs: Long = Long.MaxValue): Long = {
    import org.apache.spark.sql.expressions.Window
    val root = new Path(rootStr)
    val fs = fsOf(spark, root)
    val epoch = IndexProtocol.acquireLease(fs, commitsDir(root), writerId,
      "commitMerge", leaseTtlMs)
    assertNoOcc(fs, root, "commitMerge")
    pinBucketCount(fs, root, numBuckets, "commitMerge")
    sweepCrashed(fs, root)
    val cur = latestVersion(spark, rootStr)
    val next = cur.map(_ + 1).getOrElse(0L)
    val withBucket = incoming
      .withColumn("__bucket",
        pmod(xxhash64(col(key)), lit(numBuckets.toLong)).cast("int"))
      .withColumn("__gen", lit(1))
    cur match {
      case None =>
        commitStaged(spark, fs, root, rootStr, next, cur,
          withBucket.drop("__gen"), hooks, writerId = writerId,
          epoch = epoch)
      case Some(v) =>
        // pin the batch for the scope of the commit: the affected-bucket
        // collect and the staged write both consume it, and without the
        // pin each re-runs the caller's full source plan (see
        // TableWriter.mergeByKey — same discipline)
        val pinned = withBucket.persist()
        try {
          // bounded collect: ≤ numBuckets ids
          val affected = pinned.select("__bucket").distinct()
            .collect().map(_.getInt(0)).toIndexedSeq
          val existing = read(spark, rootStr, Some(v), Some(affected))
            .withColumn("__gen", lit(0))
          val w = Window.partitionBy(col(key)).orderBy(
            (if (resolveOrder.nonEmpty) resolveOrder
             else Seq(col("__gen").desc)): _*)
          val merged = existing
            .unionByName(pinned, allowMissingColumns = true)
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
          commitStaged(spark, fs, root, rootStr, next, cur,
            merged.drop("__gen"), hooks, writerId = writerId, epoch = epoch)
        } finally pinned.unpersist(blocking = false)
    }
    next
  }

  /** Delete rows matching `doomedKeys` (one column named `key`) as one
    * atomic committed version. Bucket-pruned like
    * [[TableWriter.deleteByKey]]: only buckets actually holding a
    * doomed row are rewritten; a delete that hits nothing commits NO
    * new version (returns the current one) — absent keys and re-runs
    * are silent, the mergeByKeyCdc silence contract. A bucket whose
    * every row is doomed simply leaves the next manifest.
    */
  def commitDelete(spark: SparkSession, rootStr: String,
      doomedKeys: DataFrame, key: String, numBuckets: Int = 16,
      writerId: String = "default",
      hooks: CommitHooks = CommitHooks.none,
      leaseTtlMs: Long = Long.MaxValue): Long = {
    val root = new Path(rootStr)
    val fs = fsOf(spark, root)
    val epoch = IndexProtocol.acquireLease(fs, commitsDir(root), writerId,
      "commitDelete", leaseTtlMs)
    assertNoOcc(fs, root, "commitDelete")
    pinBucketCount(fs, root, numBuckets, "commitDelete")
    sweepCrashed(fs, root)
    val cur = latestVersion(spark, rootStr)
    require(cur.nonEmpty, s"commitDelete: no committed version at $rootStr")
    // pin both sides: doomed feeds three passes (bucket collect, hit
    // probe, anti-join), candidates two (probe, anti-join) — see
    // TableWriter.deleteByKey, same discipline
    val doomed = doomedKeys.select(col(key)).distinct()
      .withColumn("__bucket",
        pmod(xxhash64(col(key)), lit(numBuckets.toLong)).cast("int"))
      .persist()
    try {
      // bounded collect: ≤ numBuckets ids
      val affected = doomed.select("__bucket").distinct()
        .collect().map(_.getInt(0)).toIndexedSeq
      val candidates = read(spark, rootStr, cur, Some(affected)).persist()
      try {
        // bounded collect: ≤ numBuckets ids
        val hit = candidates
          .join(doomed.select(col(key)), Seq(key), "left_semi")
          .select("__bucket").distinct().collect()
          .map(_.getInt(0)).toIndexedSeq
        if (hit.isEmpty) return cur.get
        val next = cur.get + 1
        val survivors = candidates.filter(col("__bucket").isin(hit: _*))
          .join(doomed.select(col(key)), Seq(key), "left_anti")
        commitStaged(spark, fs, root, rootStr, next, cur, survivors, hooks,
          rewrittenBuckets = Some(hit.toSet), writerId = writerId,
          epoch = epoch)
        next
      } finally candidates.unpersist(blocking = false)
    } finally doomed.unpersist(blocking = false)
  }

  /** Steps 4–6 of the protocol: stage `touched` (its `__bucket` column
    * decides which buckets this commit rewrites — for a delete, a
    * fully-emptied bucket writes no rows, so `rewrittenBuckets` names
    * the buckets whose old entries must STILL be dropped from the next
    * manifest), move in under `v<next>-` names, commit the manifest.
    */
  /** Every `checkpointEvery`-th version writes a FULL manifest; the
    * rest write O(touched-bucket) deltas. Reads resolve checkpoint +
    * tail deltas, so the interval trades commit metadata volume against
    * read-side resolution fan-in (both bounded by it).
    */
  private[graft] val checkpointEvery = 8

  private def commitStaged(spark: SparkSession, fs: FileSystem, root: Path,
      rootStr: String, next: Long, cur: Option[Long], touched: DataFrame,
      hooks: CommitHooks, rewrittenBuckets: Option[Set[Int]] = None,
      writerId: String = "default", epoch: Long = 0L): Unit = {
    val stage = new Path(root, s"_stage_v$next")
    fs.delete(stage, true)
    // cluster per bucket: file count tracks buckets (see mergeByKey)
    touched.repartition(col("__bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("__bucket")
      .parquet(stage.toString)
    hooks.beforeMove()
    val moved = IndexProtocol.moveStagedIn(fs, stage, root,
      "__bucket=", s"v$next-", stagedPath(root, next))
    val newEntries: Map[Int, Seq[String]] = moved
      .map(p => (bucketOf(p), fs.makeQualified(p).toString))
      .groupBy(_._1).map { case (b, ps) => b -> ps.map(_._2).sorted }
    val rewritten = rewrittenBuckets.getOrElse(newEntries.keySet)
    val schemaDdl = touched.schema.toDDL
    require(!schemaDdl.contains("\t") && !schemaDdl.contains("\n"),
      s"schema DDL not manifest-safe: $schemaDdl")
    val isFull = cur.isEmpty || next % checkpointEvery == 0
    val body: Seq[String] =
      if (isFull) {
        // checkpoint: the resolved live set, self-contained
        val carried: Map[Int, Seq[String]] = cur match {
          case None => Map.empty
          case Some(v) => manifestEntries(fs, root, v)
            .filterNot { case (b, _) => rewritten.contains(b) }
        }
        (carried ++ newEntries).toSeq.sortBy(_._1)
          .flatMap { case (b, ps) => ps.sorted.map(p => s"$b\t$p") }
      } else {
        // delta: O(touched buckets) lines; untouched buckets carried
        // implicitly — the prior manifest is not even read
        rewritten.toSeq.sorted.map(b => s"!$b") ++
          newEntries.toSeq.sortBy(_._1)
            .flatMap { case (b, ps) => ps.sorted.map(p => s"$b\t$p") }
      }
    hooks.beforeManifest()
    // fence check at the commit point: a writer fenced (TTL successor
    // bumped the lease epoch) mid-commit must not publish its manifest
    IndexProtocol.assertLease(fs, commitsDir(root), writerId, epoch,
      s"commitStaged(v$next)")
    IndexProtocol.writeLinesAtomic(fs, manifestPath(root, next),
      s"#graft.v2 ${if (isFull) "full" else "delta"} schema=$schemaDdl"
        +: body)
    fs.delete(stagedPath(root, next), false)
  }

  private def bucketOf(p: Path): Int =
    p.getParent.getName.stripPrefix("__bucket=").toInt

  /** Reclaim superseded generations: drop all but the newest
    * `retainLast` version manifests, then delete every data file no
    * retained manifest references. Runs under the writer lease (the
    * single-writer discipline is what makes "unreferenced" decidable —
    * an in-flight commit's files are invisible to manifests but
    * protected by serialization, not luck). Crash-safe by ordering:
    * manifests are dropped FIRST, so no retained manifest ever names a
    * deleted file; a crash mid-sweep leaves unreferenced files a re-run
    * (or the next vacuum) removes. Reading a dropped version afterwards
    * refuses loudly ([[read]]). Returns (versions dropped, files
    * deleted).
    */
  def vacuum(spark: SparkSession, rootStr: String, retainLast: Int,
      writerId: String = "default", leaseTtlMs: Long = Long.MaxValue): (Int, Int) = {
    require(retainLast >= 1, "vacuum must retain at least the latest version")
    val root = new Path(rootStr)
    val fs = fsOf(spark, root)
    // on an OPTIMISTIC-mode table (no lease on disk) vacuum still takes
    // the lease for its own duration — optimistic commits refuse while
    // it runs, which is what makes "unreferenced" decidable — and
    // releases it afterward so the table stays in optimistic mode
    val occMode = !fs.exists(new Path(commitsDir(root), "writer"))
    IndexProtocol.acquireLease(fs, commitsDir(root), writerId, "vacuum",
      leaseTtlMs)
    // under the table's publish lock: an optimistic publish that passed
    // its start-of-commit lease check before this vacuum took the lease
    // either lands BEFORE this block (vacuum then sees its version) or
    // hits the in-lock lease re-check and aborts — never a commit
    // landing between vacuum's manifest read and its file sweep
    try occLock(fs.makeQualified(root).toString).synchronized {
      vacuumUnderLease(spark, fs, root, rootStr, retainLast)
    }
    finally if (occMode) IndexProtocol.releaseLease(fs, commitsDir(root))
  }

  private def vacuumUnderLease(spark: SparkSession, fs: FileSystem,
      root: Path, rootStr: String, retainLast: Int): (Int, Int) = {
    sweepCrashed(fs, root)
    val vs = versions(spark, rootStr)
    val dropped = vs.dropRight(retainLast)
    val kept = vs.takeRight(retainLast)
    // re-anchor BEFORE dropping: the retention floor becomes a full
    // checkpoint so no retained delta's chain reaches a dropped
    // manifest. Idempotent (a re-run sees it already full); atomic
    // (writeLinesAtomic), so a crash between anchor and drops is safe.
    kept.headOption.filter(_ => dropped.nonEmpty).foreach { floor =>
      val m = parseManifest(fs, root, floor)
      if (!m.isFull) {
        val (entries, schemaDdl) = resolveManifest(fs, root, floor)
        IndexProtocol.writeLinesAtomic(fs, manifestPath(root, floor),
          s"#graft.v2 full schema=${schemaDdl.getOrElse("")}"
            +: entries.toSeq.sortBy(_._1)
              .flatMap { case (b, ps) => ps.sorted.map(p => s"$b\t$p") })
      }
    }
    dropped.foreach(v => fs.delete(manifestPath(root, v), false))
    // files named by optimistic markers are PROTECTED: a crashed-but-
    // committed attempt's marker may linger past commit (its files are
    // also in a manifest — harmless double-count), and an attempt whose
    // writer died pre-commit keeps its files until sweepOcc decides by
    // reference. Vacuum never adjudicates another writer's attempt.
    val inflight: Set[String] = occMarkers(fs, root).flatMap { m =>
      IndexProtocol.readLinesIfExists(fs, new Path(commitsDir(root), m))
        .getOrElse(Nil).filter(_.nonEmpty)
        .map(p => fs.makeQualified(new Path(p)).toString)
    }.toSet
    val live: Set[String] = kept
      .flatMap(v => manifestEntries(fs, root, v).values.flatten)
      .map(p => fs.makeQualified(new Path(p)).toString).toSet ++ inflight
    var deleted = 0
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("__bucket="))
      .foreach { d =>
        val files = fs.listStatus(d.getPath).toSeq.filter(_.isFile)
        files.foreach { f =>
          if (!live.contains(fs.makeQualified(f.getPath).toString)) {
            fs.delete(f.getPath, false); deleted += 1
          }
        }
        if (fs.listStatus(d.getPath).isEmpty) fs.delete(d.getPath, true)
      }
    (dropped.size, deleted)
  }

  /** The recorded bucket count, if any commit or [[rebucket]] has
    * pinned one (`_commits/buckets`). Commits must agree with it — a
    * commit hashing keys under a DIFFERENT count would read the wrong
    * "affected buckets" and silently lose rows, the classic mixed-
    * bucketing corruption.
    */
  def bucketCount(spark: SparkSession, rootStr: String): Option[Int] = {
    val root = new Path(rootStr)
    IndexProtocol.readLinesIfExists(fsOf(spark, root),
        new Path(commitsDir(root), "buckets"))
      .flatMap(_.headOption).map(_.trim.toInt)
  }

  /** Two-phase marker for [[rebucket]]'s count flip: written (atomic)
    * BEFORE the rebucketed manifest commits, confirmed (deleted) only
    * after the new `buckets` pin is on disk. While it exists the
    * physical bucket count is ambiguous — a crash may have landed the
    * manifest without the pin — so every count-fenced commit refuses
    * loudly instead of hashing keys under a possibly-stale count (the
    * silent mixed-bucketing corruption the pin exists to prevent).
    */
  private def rebucketIntentPath(root: Path): Path =
    new Path(commitsDir(root), "rebucket_intent")

  private def pinBucketCount(fs: FileSystem, root: Path, n: Int,
      what: String): Unit = {
    IndexProtocol.readLinesIfExists(fs, rebucketIntentPath(root)).foreach { ls =>
      throw new IllegalStateException(
        s"$what: table $root has an interrupted rebucket (intent to " +
          s"${ls.headOption.map(_.trim).getOrElse("?")} buckets recorded " +
          "but never confirmed) — the physical bucket count is ambiguous. " +
          "Re-run VersionedTable.rebucket to finish the migration before " +
          "committing.")
    }
    val p = new Path(commitsDir(root), "buckets")
    def recorded(): Option[Int] = IndexProtocol.readLinesIfExists(fs, p)
      .flatMap(_.headOption).map(_.trim.toInt)
    val rec = recorded().orElse {
      // first pin: concurrent optimistic bootstraps race on the shared
      // tmp name — losing the rename is benign (the winner wrote the
      // same file); what matters is the value we READ BACK
      try IndexProtocol.writeLinesAtomic(fs, p, Seq(n.toString))
      catch { case _: java.io.IOException | _: java.io.FileNotFoundException => () }
      recorded()
    }
    rec.foreach(r => require(r == n,
      s"$what: table ${root} is bucketed at $r but the caller passed " +
        s"numBuckets=$n — a mixed-count commit reads the wrong affected " +
        s"buckets and silently loses rows. Pass $r, or migrate with " +
        "VersionedTable.rebucket."))
  }

  /** Re-bucket the table to `newNumBuckets` as ONE committed version —
    * the maintenance op behind the sizing rule "grow bucket count with
    * the table so bucket volume stays constant" (commit cost, OCC
    * conflict granularity, stream-diff memory are all bucket-bounded
    * because of it). Content is IDENTICAL by construction:
    *   - readers flip atomically at the manifest commit (snapshot
    *     isolation; prior versions' files survive until [[vacuum]]);
    *   - the manifest CDF nets EMPTY — moved-but-equal rows cancel in
    *     [[changesBetween]]'s null-safe compare, so index syncs, MV
    *     compensation, and [[graft.streaming.VtCdfStream]] consumers
    *     replay a no-op version instead of a phantom full-table churn;
    *   - subsequent commits are fenced to the new count (the pinned
    *     `_commits/buckets` — a stale pipeline still passing the old
    *     count refuses loudly instead of corrupting).
    * Runs like [[vacuum]] on an optimistic-mode table: lease for its
    * own duration under the publish lock, released after. Returns the
    * committed version.
    */
  def rebucket(spark: SparkSession, rootStr: String, key: String,
      newNumBuckets: Int, writerId: String = "default",
      leaseTtlMs: Long = Long.MaxValue): Long = {
    require(newNumBuckets >= 1, "newNumBuckets must be >= 1")
    val root = new Path(rootStr)
    val fs = fsOf(spark, root)
    val occMode = !fs.exists(new Path(commitsDir(root), "writer"))
    val epoch = IndexProtocol.acquireLease(fs, commitsDir(root), writerId,
      "rebucket", leaseTtlMs)
    try occLock(fs.makeQualified(root).toString).synchronized {
      sweepCrashed(fs, root)
      val cur = latestVersion(spark, rootStr).getOrElse(
        throw new IllegalArgumentException(
          s"rebucket: no committed version at $rootStr"))
      val oldBuckets = manifestEntries(fs, root, cur).keySet
      val touched = read(spark, rootStr, Some(cur))
        .drop("__bucket")
        .withColumn("__bucket",
          pmod(xxhash64(col(key)), lit(newNumBuckets.toLong)).cast("int"))
      // two-phase count flip: intent BEFORE the manifest commit, pin +
      // confirm after. A crash between manifest and pin used to leave the
      // table physically at newNumBuckets with the pin still recording the
      // old count — a subsequent commit passing the old count would pass
      // the fence, hash its keys under the wrong count, and commit
      // duplicate keys. With the intent on disk, [[pinBucketCount]]
      // refuses loudly until a re-run of rebucket confirms the flip.
      IndexProtocol.writeLinesAtomic(fs, rebucketIntentPath(root),
        Seq(newNumBuckets.toString))
      commitStaged(spark, fs, root, rootStr, cur + 1, Some(cur), touched,
        CommitHooks.none, rewrittenBuckets = Some(oldBuckets),
        writerId = writerId, epoch = epoch)
      IndexProtocol.writeLinesAtomic(fs,
        new Path(commitsDir(root), "buckets"), Seq(newNumBuckets.toString))
      fs.delete(rebucketIntentPath(root), false)
      cur + 1
    }
    finally if (occMode) IndexProtocol.releaseLease(fs, commitsDir(root))
  }

  /** Hand the table over to a new writer id (only safe once the owning
    * writer is decommissioned) — the index families' lease contract.
    */
  def releaseLease(spark: SparkSession, rootStr: String): Unit = {
    val root = new Path(rootStr)
    IndexProtocol.releaseLease(fsOf(spark, root), commitsDir(root))
  }

  // ------------------------------------------------------------------
  // Optimistic concurrency (the Delta/Iceberg-class commit protocol):
  // multiple writers commit WITHOUT a table lease; conflicts are
  // detected at the commit point against the manifests that appeared
  // since the writer's read version, and a writer whose touched buckets
  // are DISJOINT from everything committed since simply REBASES its
  // already-staged files onto the new head and re-attempts. Only
  // writers that touched an overlapping bucket abort (their merge read
  // that bucket's now-stale content). At 100 TB with many pipelines
  // feeding one table, this removes the single-writer serialization the
  // r11 verdict called the bottleneck — concurrent loaders of disjoint
  // key ranges commit in parallel, and metadata arbitration (not data
  // movement) is the only serialized step.
  // ------------------------------------------------------------------

  /** Test-only crash/interleave injection for the optimistic path:
    * `beforePublish` runs after the files are moved in, before the
    * manifest-publish loop (the window where another writer's commit
    * forces a rebase or a conflict); `afterPublish` runs after the
    * manifest committed, before the staged marker is dropped.
    */
  private[graft] final case class OccHooks(
      beforePublish: () => Unit = () => (),
      afterPublish: () => Unit = () => ())
  private[graft] object OccHooks { val none: OccHooks = OccHooks() }

  /** Thrown when a concurrent commit rewrote one of this commit's
    * touched buckets: the rows this merge read from that bucket are
    * stale, so the staged output is invalid and has been cleaned up.
    * The caller retries the whole commit — its re-read sees the new
    * head, and the retry usually wins (conflicts shrink as loaders
    * partition the key space).
    */
  final class CommitConflictException(msg: String)
    extends java.util.ConcurrentModificationException(msg)

  /** JVM-wide publish arbitration per table root. Within one driver
    * JVM (the local[...] and one-cluster-driver shapes) the manifest
    * CAS below is exact; ACROSS processes it narrows to
    * exists-check + rename-no-replace — atomic on HDFS (rename refuses
    * an existing destination) and mappable to a conditional put on
    * object stores; a plain POSIX local FS leaves the classic
    * renames-overwrite window, which is why multi-PROCESS writers on
    * file:// should keep using the leased paths.
    */
  private val occLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]
  private def occLock(rootStr: String): Object =
    occLocks.getOrElseUpdate(rootStr, new Object)

  private def occStagedPath(root: Path, writerId: String) =
    new Path(commitsDir(root), s"staged_occ_$writerId")

  /** Buckets whose committed file lists differ between `fromV`
    * (exclusive; None = before the first version) and `toV` — the
    * conflict test set. Metadata-only: manifests resolve to per-bucket
    * file lists and immutable files make list identity equivalent to
    * content identity (the [[changesBetween]] pruning argument).
    */
  private def bucketsChangedSince(fs: FileSystem, root: Path,
      fromV: Option[Long], toV: Long): Set[Int] = {
    val eTo = manifestEntries(fs, root, toV)
    fromV match {
      case None => eTo.keySet
      case Some(f) =>
        val eFrom = manifestEntries(fs, root, f)
        (eFrom.keySet ++ eTo.keySet).filter { b =>
          eFrom.getOrElse(b, Nil).sorted != eTo.getOrElse(b, Nil).sorted
        }
    }
  }

  /** Sweep THIS writer's crashed optimistic attempt, if any. The staged
    * marker lists every file the attempt moved in; whether the attempt
    * COMMITTED is decided by reference — a file named by any retained
    * manifest is live (the crash was after the commit point, only the
    * marker cleanup was lost), an unreferenced file set is a dead
    * attempt and is deleted. Never touches other writers' markers:
    * theirs may be live in-flight commits, not crashes.
    */
  private def sweepOwnOcc(fs: FileSystem, root: Path, rootStr: String,
      spark: SparkSession, writerId: String): Unit = {
    val marker = occStagedPath(root, writerId)
    IndexProtocol.readLinesIfExists(fs, marker).foreach { listed =>
      val files = listed.filter(_.nonEmpty)
      val live: Set[String] = versions(spark, rootStr)
        .flatMap(v => manifestEntries(fs, root, v).values.flatten)
        .map(p => fs.makeQualified(new Path(p)).toString).toSet
      val committed =
        files.exists(f => live.contains(fs.makeQualified(new Path(f)).toString))
      if (!committed) files.foreach(f => fs.delete(new Path(f), false))
      fs.delete(marker, false)
    }
    // stage-dir litter from a crash mid-stage (before any move): this
    // writer's dirs only — other writers' stages may be live
    if (fs.exists(root)) fs.listStatus(root).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"_stage_occ-$writerId-"))
      .foreach(st => fs.delete(st.getPath, true))
  }

  /** Upsert `incoming` by `key` as one atomic committed version WITHOUT
    * the writer lease — the multi-writer path. Same merge semantics and
    * touched-bucket cost as [[commitMerge]]; the commit point runs the
    * optimistic protocol:
    *
    *   1. sweep this writer's own crashed prior attempt (reference-
    *      checked — see [[sweepOwnOcc]]);
    *   2. read the head version `r`, merge into the touched buckets'
    *      state at `r`, stage, and move the files in under
    *      attempt-unique names (`occ-<writerId>-r<r>-…` — two in-flight
    *      writers can share a bucket directory without name collisions;
    *      visibility is manifest-only, so moved-in files are inert);
    *   3. publish loop: let `h` be the current head. If `h > r`,
    *      compute the buckets changed in (r, h] from the manifest
    *      lists; an overlap with this commit's touched buckets ABORTS
    *      (staged files deleted, [[CommitConflictException]]) — the
    *      merge read stale bucket content. Disjoint → REBASE: target
    *      version `h+1`, same entries (the touched buckets' state at
    *      `r` provably equals their state at `h`). Then CAS the
    *      manifest for the target version; losing the CAS re-enters
    *      the loop against the newer head.
    *
    * The staged marker makes step 2 crash-redoable exactly-once; a
    * crash between publish and marker cleanup is resolved by reference
    * (the files are in a manifest — live). Refuses when the table has a
    * single-writer lease (mixing modes would let a leased writer's
    * sweep delete an optimistic writer's in-flight files); pick ONE
    * mode per table. Concurrent writers must use distinct `writerId`s
    * and must not make conflicting schema changes. Returns the
    * committed version id.
    */
  def commitMergeOptimistic(spark: SparkSession, rootStr: String,
      incoming: DataFrame, key: String, numBuckets: Int = 16,
      writerId: String = "w0", resolveOrder: Seq[Column] = Nil,
      hooks: OccHooks = OccHooks.none, maxRebase: Int = 100): Long = {
    import org.apache.spark.sql.expressions.Window
    val root = new Path(rootStr)
    val fs = fsOf(spark, root)
    require(!fs.exists(new Path(commitsDir(root), "writer")),
      s"commitMergeOptimistic: $rootStr holds a single-writer lease — a " +
        "table is operated in EITHER leased OR optimistic mode, never " +
        "both (releaseLease first if the leased writer is decommissioned)")
    pinBucketCount(fs, root, numBuckets, "commitMergeOptimistic")
    sweepOwnOcc(fs, root, rootStr, spark, writerId)
    val readV = latestVersion(spark, rootStr)
    val withBucket = incoming
      .withColumn("__bucket",
        pmod(xxhash64(col(key)), lit(numBuckets.toLong)).cast("int"))
      .withColumn("__gen", lit(1))
    readV match {
      case None =>
        occPublish(spark, fs, root, rootStr, readV, withBucket.drop("__gen"),
          rewrittenBuckets = None, writerId, hooks, maxRebase)
      case Some(v) =>
        // pin the batch: the affected-bucket collect and the staged write
        // both consume it (see commitMerge — same discipline)
        val pinned = withBucket.persist()
        try {
          // bounded collect: ≤ numBuckets ids
          val affected = pinned.select("__bucket").distinct()
            .collect().map(_.getInt(0)).toIndexedSeq
          val existing = read(spark, rootStr, Some(v), Some(affected))
            .withColumn("__gen", lit(0))
          val w = Window.partitionBy(col(key)).orderBy(
            (if (resolveOrder.nonEmpty) resolveOrder
             else Seq(col("__gen").desc)): _*)
          val merged = existing.unionByName(pinned, allowMissingColumns = true)
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
          occPublish(spark, fs, root, rootStr, readV, merged.drop("__gen"),
            rewrittenBuckets = None, writerId, hooks, maxRebase)
        } finally pinned.unpersist(blocking = false)
    }
  }

  /** Delete by key without the writer lease — [[commitDelete]]'s
    * semantics (bucket-pruned, hit-nothing commits no version) under
    * the optimistic protocol of [[commitMergeOptimistic]].
    */
  def commitDeleteOptimistic(spark: SparkSession, rootStr: String,
      doomedKeys: DataFrame, key: String, numBuckets: Int = 16,
      writerId: String = "w0", hooks: OccHooks = OccHooks.none,
      maxRebase: Int = 100): Long = {
    val root = new Path(rootStr)
    val fs = fsOf(spark, root)
    require(!fs.exists(new Path(commitsDir(root), "writer")),
      s"commitDeleteOptimistic: $rootStr holds a single-writer lease — " +
        "releaseLease first; a table runs in one commit mode only")
    pinBucketCount(fs, root, numBuckets, "commitDeleteOptimistic")
    sweepOwnOcc(fs, root, rootStr, spark, writerId)
    val readV = latestVersion(spark, rootStr)
    require(readV.nonEmpty,
      s"commitDeleteOptimistic: no committed version at $rootStr")
    // pinned for the same reuses as commitDelete (probe + anti-join)
    val doomed = doomedKeys.select(col(key)).distinct()
      .withColumn("__bucket",
        pmod(xxhash64(col(key)), lit(numBuckets.toLong)).cast("int"))
      .persist()
    try {
      val affected = doomed.select("__bucket").distinct()
        .collect().map(_.getInt(0)).toIndexedSeq
      val candidates = read(spark, rootStr, readV, Some(affected)).persist()
      try {
        val hit = candidates
          .join(doomed.select(col(key)), Seq(key), "left_semi")
          .select("__bucket").distinct().collect()
          .map(_.getInt(0)).toIndexedSeq
        if (hit.isEmpty) return readV.get
        val survivors = candidates.filter(col("__bucket").isin(hit: _*))
          .join(doomed.select(col(key)), Seq(key), "left_anti")
        occPublish(spark, fs, root, rootStr, readV, survivors,
          rewrittenBuckets = Some(hit.toSet), writerId, hooks, maxRebase)
      } finally candidates.unpersist(blocking = false)
    } finally doomed.unpersist(blocking = false)
  }

  /** Steps 2–3 of the optimistic protocol: stage `touched`, move in
    * under attempt-unique names guarded by this writer's staged marker,
    * then run the conflict-check / rebase / manifest-CAS loop.
    */
  private def occPublish(spark: SparkSession, fs: FileSystem, root: Path,
      rootStr: String, readV: Option[Long], touched: DataFrame,
      rewrittenBuckets: Option[Set[Int]], writerId: String,
      hooks: OccHooks, maxRebase: Int): Long = {
    require(writerId.nonEmpty && !writerId.exists(c => c == '/' || c == '\t'),
      s"writerId must be path/manifest-safe: '$writerId'")
    val marker = occStagedPath(root, writerId)
    val attempt = s"occ-$writerId-r${readV.getOrElse(-1L)}-"
    val stage = new Path(root, s"_stage_$attempt")
    fs.delete(stage, true)
    touched.repartition(col("__bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("__bucket")
      .parquet(stage.toString)
    val moved = IndexProtocol.moveStagedIn(fs, stage, root,
      "__bucket=", attempt, marker)
    val newEntries: Map[Int, Seq[String]] = moved
      .map(p => (bucketOf(p), fs.makeQualified(p).toString))
      .groupBy(_._1).map { case (b, ps) => b -> ps.map(_._2).sorted }
    val myBuckets = rewrittenBuckets.getOrElse(newEntries.keySet)
    val schemaDdl = touched.schema.toDDL
    require(!schemaDdl.contains("\t") && !schemaDdl.contains("\n"),
      s"schema DDL not manifest-safe: $schemaDdl")
    hooks.beforePublish()

    def abortConflict(since: Long, overlap: Set[Int]): Nothing = {
      IndexProtocol.redoFromManifest(fs, marker)
      fs.delete(marker, false)
      throw new CommitConflictException(
        s"optimistic commit by '$writerId' on $rootStr conflicts: " +
          s"bucket(s) ${overlap.toSeq.sorted.mkString(",")} were " +
          s"rewritten by commits after read version ${readV.getOrElse(-1L)} " +
          s"(head now $since). Staged files cleaned; retry from a fresh " +
          "snapshot.")
    }

    var rebases = 0
    while (true) {
      val head = latestVersion(spark, rootStr)
      // conflict check OUTSIDE the lock (metadata reads only)
      head.filter(h => readV.forall(_ < h)).foreach { h =>
        val changed =
          try bucketsChangedSince(fs, root, readV, h)
          catch {
            case e: IllegalArgumentException =>
              // the read version (or part of its delta chain) was dropped
              // by a retention sweep while this commit was in flight — the
              // conflict set is undecidable against a vacuumed snapshot.
              // Clean up like any other conflict instead of leaking the
              // staged marker behind a raw missing-manifest error.
              IndexProtocol.redoFromManifest(fs, marker)
              fs.delete(marker, false)
              throw new CommitConflictException(
                s"optimistic commit by '$writerId' on $rootStr cannot " +
                  s"verify conflicts: read version ${readV.getOrElse(-1L)} " +
                  s"is no longer resolvable (${e.getMessage}). Staged " +
                  "files cleaned; retry from a fresh snapshot.")
          }
        val overlap = changed intersect myBuckets
        if (overlap.nonEmpty) abortConflict(h, overlap)
      }
      val next = head.map(_ + 1).getOrElse(0L)
      val isFull = head.isEmpty || next % checkpointEvery == 0
      val body: Seq[String] =
        if (isFull) {
          val carried: Map[Int, Seq[String]] = head match {
            case None => Map.empty
            case Some(h) => manifestEntries(fs, root, h)
              .filterNot { case (b, _) => myBuckets.contains(b) }
          }
          (carried ++ newEntries).toSeq.sortBy(_._1)
            .flatMap { case (b, ps) => ps.sorted.map(p => s"$b\t$p") }
        } else {
          myBuckets.toSeq.sorted.map(b => s"!$b") ++
            newEntries.toSeq.sortBy(_._1)
              .flatMap { case (b, ps) => ps.sorted.map(p => s"$b\t$p") }
        }
      val header =
        s"#graft.v2 ${if (isFull) "full" else "delta"} schema=$schemaDdl"
      val lines = header +: body
      val won = occLock(fs.makeQualified(root).toString).synchronized {
        // a lease appearing after this commit's start-of-commit check
        // means a vacuum (or a mode flip) is in progress — publishing
        // under it could land a version the vacuum's sweep never saw.
        // Checked INSIDE the lock so it orders against vacuum's pass.
        if (fs.exists(new Path(commitsDir(root), "writer"))) {
          IndexProtocol.redoFromManifest(fs, marker)
          fs.delete(marker, false)
          throw new CommitConflictException(
            s"optimistic commit by '$writerId' on $rootStr aborted: a " +
              "writer lease appeared mid-commit (vacuum or a mode flip " +
              "is in progress). Staged files cleaned; retry once it " +
              "finishes.")
        }
        val target = manifestPath(root, next)
        if (fs.exists(target)) false
        else {
          // tmp + rename keeps the publish atomic for READERS; the
          // exists-check + in-JVM lock arbitrates WRITERS (exact in
          // one JVM; rename-no-replace on HDFS; conditional put on
          // object stores — see [[occLock]])
          val tmp = new Path(commitsDir(root), s".v_$next.$writerId.tmp")
          val out = fs.create(tmp, true)
          try out.write(lines.mkString("", "\n", "\n").getBytes("UTF-8"))
          finally out.close()
          if (!fs.rename(tmp, target)) { fs.delete(tmp, false); false }
          else true
        }
      }
      if (won) {
        hooks.afterPublish()
        fs.delete(marker, false)
        return next
      }
      rebases += 1
      if (rebases > maxRebase) {
        IndexProtocol.redoFromManifest(fs, marker)
        fs.delete(marker, false)
        throw new CommitConflictException(
          s"optimistic commit by '$writerId' on $rootStr lost the " +
            s"manifest race $maxRebase times — giving up (staged files " +
            "cleaned; retry)")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Change-data-feed read DERIVED FROM THE MANIFESTS (the Delta CDF
    * analogue, with no change feed maintained at write time): the net
    * row-level changes between two committed versions, classified as
    * `insert` / `delete` / `update_pre` / `update_post` (the engine's
    * CDC vocabulary — [[TableWriter.mergeByKeyCdc]]'s op set, so the
    * output composes with every feed consumer: index sync, MV
    * compensation, replicas).
    *
    * BUCKET-PRUNED by construction: files are immutable and manifests
    * name them per bucket, so a bucket whose file list is IDENTICAL in
    * both manifests cannot have changed — only DIFFERING buckets are
    * read, in either version. At 100 TB a between-versions diff that
    * touched 3 buckets reads 2×3 bucket file sets, not two table
    * snapshots. Within differing buckets, rewritten-but-equal rows
    * (carried by a bucket rewrite) cancel in the null-safe full-outer
    * compare and emit nothing — the diff is NET row changes, not file
    * churn.
    *
    * Output: `change_op` plus the row image — pre-image for
    * delete/update_pre, post-image for insert/update_post. Both
    * versions must still be retained ([[read]] refuses otherwise).
    */
  def changesBetween(spark: SparkSession, rootStr: String, key: String,
      fromV: Long, toV: Long): DataFrame = {
    require(fromV < toV, s"changesBetween: fromV $fromV must precede toV $toV")
    val root = new Path(rootStr)
    val fs = fsOf(spark, root)
    val (eFrom, _) = resolveManifest(fs, root, fromV)
    val (eTo, _) = resolveManifest(fs, root, toV)
    val changed = (eFrom.keySet ++ eTo.keySet).filter { b =>
      eFrom.getOrElse(b, Nil).sorted != eTo.getOrElse(b, Nil).sorted
    }.toSeq.sorted
    val old = read(spark, rootStr, Some(fromV), Some(changed)).drop("__bucket")
    val neu = read(spark, rootStr, Some(toV), Some(changed)).drop("__bucket")
    val dataCols = (old.columns.toSet ++ neu.columns.toSet - key).toSeq.sorted
    def side(df: DataFrame, tag: String): DataFrame =
      df.select(col(key) +: lit(true).as(s"__has_$tag") +:
        dataCols.map(c =>
          (if (df.columns.contains(c)) col(c)
           else lit(null)).as(s"__${tag}_$c")): _*)
    val j = side(old, "a").join(side(neu, "b"), Seq(key), "full_outer")
    val same = dataCols.map(c => col(s"__a_$c") <=> col(s"__b_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val hasA = coalesce(col("__has_a"), lit(false))
    val hasB = coalesce(col("__has_b"), lit(false))
    def img(tag: String, op: String, pred: Column): DataFrame =
      j.filter(pred).select(
        lit(op).as("change_op") +: col(key) +:
          dataCols.map(c => col(s"__${tag}_$c").as(c)): _*)
    img("a", "delete", hasA && !hasB)
      .unionByName(img("b", "insert", hasB && !hasA))
      .unionByName(img("a", "update_pre", hasA && hasB && !same))
      .unionByName(img("b", "update_post", hasA && hasB && !same))
  }
}
