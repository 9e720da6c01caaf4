package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical retrieval and rank fusion over the documents corpus — the
  * text half of a retrieval stack next to [[Similarity]]'s vector half.
  *
  * Scale shape (the part that matters at 100 TB):
  *   - [[bm25TopK]] is the classic inverted-index serving plan expressed
  *     relationally: ONE shuffle builds the (doc, term) postings with
  *     map-side combine, the (tiny) query term set is broadcast against
  *     it, and from that point every frame in the plan is
  *     candidate-bounded — docs sharing at least one query term. The
  *     corpus-wide frames (postings, document-length stats) never join
  *     each other; document frequencies are computed on the
  *     query-term-restricted postings only. No corpus-sized window, no
  *     driver collect.
  *   - [[rrfFuse]] joins two rank frames that are both top-k-bounded
  *     (|queries| × k rows), so fusion cost is independent of corpus
  *     size by construction.
  *
  * Determinism discipline (what makes these hash-matchable in DuckDB):
  * per-term BM25 partials are cast to DECIMAL(38,18) and summed exactly
  * — order-independent by construction, never a float SUM whose
  * addition order the engine chooses. The one non-portable operation is
  * ln() — Java's Math.log and DuckDB's libm disagree by 1 ulp on ~0.1%
  * of idf arguments (measured) — so the contract output is the RANKING,
  * not the score: rank flips would need two distinct docs within ~1e-13
  * relative score, and genuinely distinct docs differ by whole terms
  * while identical docs tie exactly in both engines and break on doc_id.
  */
object Retrieval {

  /** Read the one-row `{name}_stats` table's two longs with a direct
    * driver-side parquet read — a protocol batch pays one file open for
    * them, not a full Spark job submission (plan + schedule + collect),
    * which was a fixed ~50-100 ms driver round trip per batch on every
    * append/delete leg. The table is always a one-row (n_docs, sum_dl)
    * materialization; anything else fails loudly.
    */
  private def readStatsDirect(writer: graft.sources.TableWriter,
      name: String): (Long, Long) = {
    val dir = new org.apache.hadoop.fs.Path(writer.path(s"${name}_stats"))
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = dir.getFileSystem(conf)
    val parts = fs.listStatus(dir).filter(st => st.isFile &&
      st.getPath.getName.endsWith(".parquet") && st.getLen > 0)
    var out: Option[(Long, Long)] = None
    parts.foreach { st =>
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(),
          st.getPath)
        .withConf(conf).build()
      try {
        var g = reader.read()
        while (g != null) {
          require(out.isEmpty, s"stats table at $dir has more than one row")
          out = Some((g.getLong("n_docs", 0), g.getLong("sum_dl", 0)))
          g = reader.read()
        }
      } finally reader.close()
    }
    out.getOrElse(
      throw new IllegalStateException(s"stats table at $dir is empty"))
  }

  /** Distinct (query_id, term) rows from the first `nTerms` tokens of
    * each predicate-selected document — the deterministic query workload
    * used by the v10/v11 entries. Query sets are assumed (and asserted
    * nowhere else) to be broadcast-sized: queries are a serving-side
    * input, not a corpus.
    */
  def queryTerms(docs: DataFrame, pred: Column, nTerms: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.filter(pred)
      .select(col(idCol).as("query_id"),
        explode(slice(split(col(textCol), " "), 1, nTerms)).as("term"))
      .distinct()

  /** Tokenized postings: one shuffle, map-side combined; dl rides the
    * key (it is functionally dependent on doc_id, so key cardinality is
    * unchanged). Columns: (doc_id, dl, term, tf).
    */
  private def postingsOf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))

  /** Shared scoring tail: candidate postings already restricted to query
    * terms and carrying their df, joined to the (local, broadcast) query
    * frame, scored per term, folded per (query, doc) in term order, and
    * ranked per query. Corpus stats arrive as driver literals — two
    * scalars whose collection is exact (long counts), so score bits are
    * unchanged vs a frame-borne cross join, and no broadcast-build job
    * re-executes corpus lineage for a single row.
    */
  private def scoreAndRank(cand: DataFrame, qDf: DataFrame, k: Int,
      k1: Double, b: Double, nDocs: Long, avgdl: Double,
      excludeSelf: Boolean): DataFrame = {
    val scored0 = cand.join(broadcast(qDf), Seq("term"))
    val scored = (if (excludeSelf)
      scored0.filter(col("doc_id") =!= col("query_id")) else scored0)
      .withColumn("s",
        log((lit(nDocs.toDouble) - col("df").cast("double")
            + lit(0.5)) / (col("df").cast("double") + lit(0.5)) + lit(1.0))
          * (col("tf").cast("double") * lit(k1 + 1.0))
          / (col("tf").cast("double")
            + lit(k1) * (lit(1.0 - b)
              + lit(b) * col("dl").cast("double") / lit(avgdl))))

    // deterministic summation without an order-pinned fold: per-term
    // partials are cast to DECIMAL(38,18) and summed EXACTLY — addition
    // order can't matter, the aggregate stays codegen'd with map-side
    // partials (a collect_list+sorted-fold formulation measured 5×
    // slower: interpreted ObjectHashAggregate over per-group arrays).
    // 1e-18 resolution is far below any real score gap; the double→
    // decimal cast follows the repo's q1-era money convention.
    val perDoc = scored
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).cast("long").as("n_hit"),
        sum(col("s").cast("decimal(38,18)")).as("score"))

    rankTopK(perDoc, k, col("score"), col("n_hit"))
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("payload").as("n_hit"))
  }

  /** Distributed per-query top-k rank — the serving-side replacement for
    * `row_number() over (partitionBy(query_id) orderBy score desc,
    * doc_id asc)`, whose single-task-per-query sort is the one plan
    * shape that does not survive a 100× corpus (one mid-df query term =
    * one task sorting millions of candidates). The bounded-heap
    * [[graft.functions.TopKRankAggregator]] aggregates with map-side
    * partials, so each partition ships ≤k rows per query and the final
    * merge sees ≤ partitions×k rows; the emitted list is totally ordered
    * by (score desc, doc_id asc), so list position + 1 IS row_number —
    * rankings are bit-identical to the window formulation (RetrievalSpec
    * pins frame equality; the serving oracles hash unchanged).
    * Output: (query_id, doc_id, rank, payload, score); callers project.
    */
  private def rankTopK(cand: DataFrame, k: Int, score: Column,
      payload: Column): DataFrame = {
    val topk = udaf(new graft.functions.TopKRankAggregator(k),
      org.apache.spark.sql.Encoders.product[graft.functions.RankedDoc])
    cand
      .groupBy("query_id")
      .agg(topk(score.cast("decimal(38,18)"), col("doc_id"),
        payload.cast("long")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("query_id"), col("r.docId").as("doc_id"),
        (col("pos") + 1).as("rank"), col("r.payload").as("payload"),
        col("r.score").as("score"))
  }

  /** Driver-side replica of the layouts' bucketing expression
    * `pmod(xxhash64(term), buckets)` — the SAME XXH64 (seed 42) Spark's
    * `xxhash64` Column evaluates, called on the term's UTF-8 bytes
    * directly. Every serving call used to compute its handful of bucket
    * ids through a one-row Spark job ("local-data job"); at 1–3 such
    * jobs per serve the fixed job-submission round trips were the
    * protocol family's contention amplifier (r10 verdict: 5–17× under
    * box load while scan entries drifted 1.15×). Bit-equality with the
    * Column form is spec-pinned (BenchProfileSpec) — a drift here would
    * silently prune the WRONG buckets.
    */
  private[graft] def termBucket(term: String, buckets: Int): Int = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(term)
    val h = org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
    val m = (h % buckets).toInt
    if (m < 0) m + buckets else m
  }

  private[graft] def termBuckets(terms: Seq[String], buckets: Int): Seq[Int] =
    terms.map(termBucket(_, buckets)).distinct.sorted

  /** Collect the (bounded, serving-side) query workload to the driver:
    * (query_id, term) pairs plus the sorted distinct term list. Queries
    * are requests, not a corpus — materializing them once keeps their
    * lineage from re-executing under every broadcast build.
    */
  private def localQueries(queries: DataFrame): (Seq[(Long, String)], Seq[String]) = {
    val rows = queries.select(col("query_id").cast("long"), col("term"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    (rows, rows.map(_._2).distinct.sorted)
  }

  /** BM25 top-k retrieval (Robertson–Spärck Jones idf, k1/b as given),
    * one-shot over a corpus frame. `queries` carries distinct
    * (query_id, term) rows and is collected (bounded serving input).
    * Output: (query_id, doc_id, rank, n_hit) — rank 1..k by score desc
    * with doc_id as the total tie-break, n_hit = matched query terms.
    * Set `excludeSelf` when query ids live in the doc id space and the
    * query document itself should not be retrieved.
    *
    * Plan shape: ONE corpus pass builds the postings and a second
    * computes the per-query-term document frequencies (both map-side
    * combined); stats and dfs are driver-side scalars bounded by the
    * query term count, so the main job is a single linear pipeline —
    * scan → explode → combine-agg → term filter → two local-broadcast
    * joins → fold → per-query top-k. For repeated query batches use
    * [[buildBm25Index]]/[[queryBm25Index]], which persist the corpus
    * passes.
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75, excludeSelf: Boolean = false,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (qRows, qTerms) = localQueries(queries)
    val qDf = qRows.toDF("query_id", "term")

    val ws = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
    val statsRow = ws.agg(count(lit(1)), sum(size(col("toks")))).collect()(0)
    val nDocs = statsRow.getLong(0)
    val avgdl = statsRow.getLong(1).toDouble / nDocs.toDouble

    val candTf = postingsOf(docs, idCol, textCol)
      .filter(col("term").isin(qTerms: _*))
    // df per query term: bounded by |qTerms|, collected and joined as
    // local data (the alternative — a per-term window — repartitions
    // candidate postings BY TERM, which skews on common terms)
    val dfs = candTf.groupBy("term").agg(count(lit(1)).as("df"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val cand = candTf.join(broadcast(dfs.toDF("term", "df")), Seq("term"))
    scoreAndRank(cand, qDf, k, k1, b, nDocs, avgdl, excludeSelf)
  }

  /** Persist the BM25 serving index — the inverted-index layout that
    * amortizes the corpus passes across query batches, in the same
    * style as the IVF/PQ ANN index (v7/v9):
    *   - `{name}_postings`: (doc_id, dl, term, tf) partitioned by
    *     `term_bucket = pmod(xxhash64(term), buckets)` — a query batch
    *     prunes to the buckets its terms hash into, so the fraction of
    *     postings read scales with the query vocabulary, not the corpus
    *     (hash-bucketed, not term-partitioned: real vocabularies are
    *     100k+ terms, which would explode the directory count, and
    *     Zipf-heavy terms would skew single-term partitions);
    *   - `{name}_vocab`: (term, df) — document frequencies for ALL
    *     terms, computed once from the written postings (no second
    *     corpus tokenize), partitioned by `vocab_bucket =
    *     pmod(xxhash64(term), vocabBuckets)` so df merges (append /
    *     delete) rewrite only the buckets the batch's vocabulary hashes
    *     into, and query-term df lookups partition-prune — a web-scale
    *     vocabulary (10⁸ terms) no longer funnels through one write
    *     task. Size `vocabBuckets` by the vocabulary the way mergeByKey
    *     sizes `__bucket` by the table: bucket volume constant, so
    *     merge cost tracks the BATCH's vocabulary (ScaleProbe "vocab"
    *     measures it at 10⁶ terms);
    *   - `{name}_stats`: one row (n_docs, sum_dl).
    */
  def buildBm25Index(docs: DataFrame, writer: graft.sources.TableWriter,
      name: String, buckets: Int = 64, vocabBuckets: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    val tf = postingsOf(docs, idCol, textCol)
      .withColumn("term_bucket",
        pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))
    // cluster by bucket before the partitioned write: without this every
    // shuffle partition spills a sliver into every bucket directory
    // (partitions × buckets small files — file-listing cost dwarfs the
    // data at query time); with it each bucket directory is one
    // contiguous file per writing task that owns it
    writer.materialize(s"${name}_postings",
      tf.repartition(col("term_bucket")),
      partitionBy = Seq("term_bucket"))
    val written = writer.read(spark, s"${name}_postings")
    writer.materialize(s"${name}_vocab",
      written.groupBy("term").agg(count(lit(1)).as("df"))
        .withColumn("vocab_bucket",
          pmod(xxhash64(col("term")), lit(vocabBuckets.toLong)).cast("int"))
        .repartition(col("vocab_bucket")), // one file per bucket dir
      partitionBy = Seq("vocab_bucket"))
    writer.materialize(s"${name}_stats",
      docs.select(split(col(textCol), " ").as("toks"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(col("toks"))).cast("long").as("sum_dl")))
  }

  /** Read the vocab pruned to the buckets a term set hashes into (the
    * df-lookup twin of the postings' bucket pruning). `terms` empty →
    * the whole vocab (the merge paths prune separately).
    */
  private def vocabPruned(spark: org.apache.spark.sql.SparkSession,
      writer: graft.sources.TableWriter, name: String,
      terms: Seq[String], vocabBuckets: Int): DataFrame = {
    import spark.implicits._
    val base = writer.read(spark, s"${name}_vocab")
      .withColumn("vocab_bucket", col("vocab_bucket").cast("int"))
    if (terms.isEmpty) base
    else {
      // bucket ids via the driver-side xxhash64 replica ([[termBucket]],
      // spec-pinned == the engine's) — cast-free partition pruning with
      // zero extra Spark jobs per serve
      val hit = termBuckets(terms, vocabBuckets)
      base.filter(col("vocab_bucket").isin(hit: _*)
        && col("term").isin(terms: _*))
    }
  }

  /** Merge a (term, df) delta into the bucketed vocab: only the buckets
    * the delta's terms hash into are read, merged (staged to disk —
    * the merge plan reads the files being overwritten), and
    * dynamic-partition-overwritten; buckets left with no surviving
    * terms are deleted (dynamic overwrite cannot write an empty
    * partition). Untouched buckets stay byte-stable (spec-asserted).
    * `combine` receives (df_old nullable, df_delta nullable) and
    * returns the new df; rows with non-positive df are dropped.
    */
  private def mergeVocab(spark: org.apache.spark.sql.SparkSession,
      writer: graft.sources.TableWriter, name: String, delta: DataFrame,
      vocabBuckets: Int, combine: (Column, Column) => Column,
      touchedOpt: Option[Seq[Int]] = None): Unit = {
    val vocabPath = writer.path(s"${name}_vocab")
    val withBucket = delta.withColumn("vocab_bucket",
      pmod(xxhash64(col("term")), lit(vocabBuckets.toLong)).cast("int"))
    // bounded collect: ≤ vocabBuckets ids — or the caller's precomputed
    // set (the batch-append leg collects it fused with the batch stats,
    // saving a job per batch)
    val touched = touchedOpt.map(_.sorted.toArray).getOrElse(
      withBucket.select("vocab_bucket").distinct()
        .collect().map(_.getInt(0)).sorted)
    if (touched.isEmpty) return
    val existing = spark.read.parquet(vocabPath)
      .withColumn("vocab_bucket", col("vocab_bucket").cast("int"))
      .filter(col("vocab_bucket").isin(touched.toIndexedSeq: _*))
      .select(col("term"), col("df").as("df_old"))
    val merged = existing
      .join(withBucket.select(col("term"), col("df_delta")),
        Seq("term"), "full_outer")
      .select(col("term"), combine(col("df_old"), col("df_delta")).as("df"))
      .filter(col("df") > 0)
      .withColumn("vocab_bucket",
        pmod(xxhash64(col("term")), lit(vocabBuckets.toLong)).cast("int"))
    // publish by stage-then-swap (TableWriter.swapStagedDirs): the merged
    // buckets are physically written ONCE, partitioned — the old plan
    // wrote them flat to a stage, read the stage back, and re-wrote
    // everything under dynamic partition overwrite (every merged byte
    // written twice plus an extra read and a distinct-collect job).
    // The merge plan reads the very files being replaced, which is why
    // the write lands in a stage dir first and reaches the live bucket
    // dirs only as renames.
    val stage = writer.path(s"__stage_vocab_$name")
    val stageP = new org.apache.hadoop.fs.Path(stage)
    val root = new org.apache.hadoop.fs.Path(vocabPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val surviving: Set[Int] = try {
      merged.repartition(col("vocab_bucket")) // one file per bucket dir
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("vocab_bucket")
        .parquet(stage)
      graft.sources.TableWriter
        .swapStagedDirs(fs, stageP, root, "vocab_bucket=").toSet
    } finally {
      fs.delete(stageP, true)
    }
    touched.filterNot(surviving).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"vocab_bucket=$b"), true)
    }
  }

  /** Incremental ingest into a persisted BM25 index — the lexical third
    * of the crawl-pattern triad (d37 minhash bands, v12 IVF lists, this):
    * the batch's postings are tokenized ONCE and appended into the
    * bucket-partitioned layout (existing postings files untouched), the
    * vocabulary's document frequencies are additively merged into ONLY
    * the vocab buckets the batch's terms hash into ([[mergeVocab]] —
    * untouched vocab buckets byte-stable), and the two corpus scalars
    * are updated from driver-side longs. Every update is integer
    * addition, so append == rebuild BIT-EXACTLY, query-for-query
    * (RetrievalSpec pins it) — unlike the ANN indexes there is no
    * frozen-quantizer approximation trade-off. Batch docs must be NEW
    * ids (same contract as the other appends). Cost: linear in the
    * batch for postings; the df merge tracks the BATCH's vocabulary ×
    * bucket volume, not the corpus vocabulary (bucket count sized to
    * the vocabulary, mergeByKey-style — ScaleProbe "vocab" measures a
    * 10⁶-term vocabulary).
    */
  def appendBm25Index(newDocs: DataFrame, writer: graft.sources.TableWriter,
      name: String, buckets: Int = 64, vocabBuckets: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = newDocs.sparkSession
    // bootstrap: the first batch CREATES the index, so a streaming
    // ingest needs no out-of-band initial build (q89 relies on this)
    val statsP = new org.apache.hadoop.fs.Path(writer.path(s"${name}_stats"))
    if (!statsP.getFileSystem(spark.sessionState.newHadoopConf()).exists(statsP)) {
      buildBm25Index(newDocs, writer, name, buckets, vocabBuckets,
        idCol, textCol)
      return
    }
    // one tokenize pass serves all three updates (postings, dfs, stats):
    // the batch postings are pinned for the scope of the append — without
    // this, the postings write, the df merge, and the stats update each
    // re-tokenize the batch
    val tfB = postingsOf(newDocs, idCol, textCol)
      .withColumn("term_bucket",
        pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))
      .persist()
    try {
      writer.materialize(s"${name}_postings",
        tfB.repartition(col("term_bucket")),
        partitionBy = Seq("term_bucket"),
        mode = org.apache.spark.sql.SaveMode.Append)

      // dfs merge rewrites only the buckets the BATCH's vocabulary
      // hashes into — integer addition, so append == rebuild holds
      // bucket for bucket
      mergeVocab(spark, writer, name,
        tfB.groupBy("term").agg(count(lit(1)).as("df_delta")),
        vocabBuckets,
        (old, delta) => coalesce(old, lit(0L)) + coalesce(delta, lit(0L)))

      // stats: two longs via the driver — derived from the pinned
      // postings ((doc_id, dl) is distinct per doc there; every doc has
      // ≥1 posting since split("") = [""]); the read happens before
      // the overwrite, so there is no read-your-own-write hazard
      val (oldN, oldS) = readStatsDirect(writer, name)
      val b = tfB.select(col("doc_id"), col("dl")).distinct()
        .agg(count(lit(1)).as("n"), sum(col("dl")).cast("long").as("s"))
        .collect()(0)
      import spark.implicits._
      writer.materialize(s"${name}_stats",
        Seq((oldN + b.getAs[Long]("n"), oldS + b.getAs[Long]("s")))
          .toDF("n_docs", "sum_dl"))
    } finally tfB.unpersist(blocking = false)
  }

  /** EXACTLY-ONCE batch append into a persisted BM25 index — the
    * streaming-ingest form of [[appendBm25Index]] (q89/q106): Spark's
    * foreachBatch is at-least-once (a batch whose append completed but
    * whose checkpoint commit didn't is REDELIVERED after a restart),
    * and a plain append double-applies it. This variant is idempotent
    * per `batchId` under a write-ahead protocol:
    *
    *   0. WRITER FENCE: the protocol assumes ONE writer; a second
    *      concurrent stream's interleaved flag/marker writes would
    *      corrupt vocab silently. [[IndexProtocol.acquireLease]] pins
    *      the index to `writerId` (pass the stream's checkpoint
    *      location); a different id fails loudly, the same id
    *      re-acquires freely (the restart case).
    *   1. `{name}_commits/batch_<id>` marker present → the batch is
    *      fully applied; stale protocol litter (a crash between the
    *      marker and the flag clears) is swept, and return.
    *   2. POSTINGS REDO, O(batch): a crashed attempt's moved-in files
    *      are deleted by replaying the attempt's own staged-file
    *      manifest (`{name}_commits/staged_<id>`, written BEFORE any
    *      rename — so it covers every file a crash can have landed).
    *      No bucket directory is listed — redo cost tracks the batch's
    *      buckets, not buckets × batches namenode calls. Then the
    *      batch's postings are staged and moved in under deterministic
    *      `b<id>-…` names behind a fresh manifest.
    *   3. VOCAB/STATS under the `{name}_vocab_dirty` write-ahead flag,
    *      which records `(batchId, pre-merge n_docs, pre-merge
    *      sum_dl)` — or `bootstrap` — BEFORE any derived write in
    *      EITHER branch (bootstrap too: without the flag, a crash
    *      after the bootstrap's vocab/stats materialize but before the
    *      marker would leave stats present + dirty absent, and
    *      redelivery would take the incremental branch and double-add
    *      the batch — an unrepairable count). Recovery is
    *      BUCKET-SCOPED: a crashed incremental merge can only have
    *      damaged the vocab buckets the batch's vocabulary hashes into
    *      (mergeVocab overwrites nothing else) plus the stats row, so
    *      redelivery recomputes ONLY those buckets' dfs from the
    *      postings (the ground truth step 2 just made correct) and
    *      patches stats from the flag's snapshot plus the batch's own
    *      deterministic contribution — recovery cost tracks the
    *      BATCH's vocabulary, not the index (`ScaleProbe recovery`
    *      measures it). A crashed bootstrap rebuilds vocab+stats from
    *      the postings, which at bootstrap are batch-sized.
    *   4. marker, then the flags clear. A crash between them leaves
    *      litter that the next call's fast path (step 1) or the stale-
    *      flag check sweeps — never incorrect state.
    *
    * Every recovery path lands on the same final index bytes as an
    * uninterrupted run (IndexRestartSpec kills mid-protocol and
    * diffs; q106 runs the real readStream kill/restart under v10's
    * oracle). Batch ids must be the streaming engine's epoch ids —
    * monotone, replayed verbatim on restart.
    */
  def appendBm25IndexBatch(newDocs: DataFrame,
      writer: graft.sources.TableWriter, name: String, batchId: Long,
      buckets: Int = 64, vocabBuckets: Int = 16,
      idCol: String = "doc_id", textCol: String = "text",
      writerId: String = "default"): Unit = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    def path(p: String) = new org.apache.hadoop.fs.Path(writer.path(p))
    val commitsDir = path(s"${name}_commits")
    val fs = commitsDir.getFileSystem(conf)
    val leaseEpoch = IndexProtocol.acquireLease(fs, commitsDir, writerId,
      s"appendBm25IndexBatch($name)")
    val marker = path(s"${name}_commits/batch_$batchId")
    val stagedMf = path(s"${name}_commits/staged_$batchId")
    val dirty = path(s"${name}_vocab_dirty")
    if (IndexProtocol.isMarked(fs, commitsDir, s"batch_$batchId",
        "frontier_batch", batchId)) {
      // committed: sweep litter a crash between marker and clears left
      fs.delete(dirty, false); fs.delete(stagedMf, false)
      return
    }
    // an empty batch on an UNBORN index (a delete-only first feed batch
    // routed through the append leg): nothing to bootstrap from — commit
    // the marker and wait for a batch with rows. Checked only while
    // stats are absent, so the isEmpty job never runs in steady state.
    if (!fs.exists(path(s"${name}_stats")) && newDocs.isEmpty) {
      IndexProtocol.assertLease(fs, commitsDir, writerId, leaseEpoch,
        s"appendBm25IndexBatch($name)")
      fs.create(marker, true).close(); return
    }
    val postRoot = path(s"${name}_postings")

    // ---- step 2: postings redo (O(batch), manifest-driven) ----
    IndexProtocol.redoFromManifest(fs, stagedMf)
    val tfB = postingsOf(newDocs, idCol, textCol)
      .withColumn("term_bucket",
        pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))
      .persist()
    try {
      val stage = path(s"__stage_b${batchId}_$name")
      tfB.repartition(col("term_bucket"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("term_bucket").parquet(stage.toString)
      IndexProtocol.moveStagedIn(fs, stage, postRoot,
        partitionPrefix = "term_bucket=", batchPrefix = s"b$batchId-",
        manifest = stagedMf)

      // batch contribution to stats AND the batch's touched vocab
      // buckets in ONE collect (two tiny tagged frames unioned — both
      // derive from the pinned batch postings, and each former separate
      // collect was a fixed driver round trip per batch): tag 0 rows are
      // the distinct vocab-bucket ids, the tag 1 row is (n_docs, Σdl).
      // Used by both the incremental and recovery paths.
      lazy val (bStat: (Long, Long), touchedVb: Seq[Int]) = {
        val rows = tfB
          .select(lit(0).as("tag"),
            pmod(xxhash64(col("term")), lit(vocabBuckets.toLong)).as("a"),
            lit(0L).as("b"))
          .distinct()
          .unionAll(tfB.select(col("doc_id"), col("dl")).distinct()
            .agg(count(lit(1)).as("n"),
              coalesce(sum(col("dl")).cast("long"), lit(0L)).as("s"))
            .select(lit(1).as("tag"), col("n").as("a"), col("s").as("b")))
          .collect()
        val touched = rows.filter(_.getInt(0) == 0)
          .map(_.getLong(1).toInt).toSeq
        val st = rows.find(_.getInt(0) == 1)
          .map(r => (r.getLong(1), r.getLong(2))).getOrElse((0L, 0L))
        (st, touched)
      }
      def writeStats(n: Long, s: Long): Unit =
        writer.materialize(s"${name}_stats",
          Seq((n, s)).toDF("n_docs", "sum_dl"))
      // exact rebuild of vocab+stats from the postings (bootstrap /
      // bootstrap-crash recovery; batch-sized at bootstrap)
      def rebuildAllFromPostings(): Unit = {
        val written = writer.read(spark, s"${name}_postings")
        writer.materialize(s"${name}_vocab_next",
          written.groupBy("term").agg(count(lit(1)).as("df"))
            .withColumn("vocab_bucket",
              pmod(xxhash64(col("term")), lit(vocabBuckets.toLong)).cast("int"))
            .repartition(col("vocab_bucket")),
          partitionBy = Seq("vocab_bucket"))
        val vDst = path(s"${name}_vocab")
        fs.delete(vDst, true)
        fs.rename(path(s"${name}_vocab_next"), vDst)
        val st = written.select(col("doc_id"), col("dl")).distinct()
          .agg(count(lit(1)).as("n"), sum(col("dl")).cast("long").as("s"))
          .collect()(0)
        writeStats(st.getAs[Long]("n"), st.getAs[Long]("s"))
      }
      // bucket-scoped vocab repair: recompute dfs from the postings for
      // ONLY the vocab buckets the batch's vocabulary hashes into. When
      // buckets % vocabBuckets == 0, postings bucket b holds exactly the
      // terms whose vocab bucket is b % vocabBuckets, so the recompute
      // reads buckets/vocabBuckets of the postings per touched vocab
      // bucket and is complete for them by construction.
      def recoverTouchedVocabBuckets(): Boolean = {
        if (buckets % vocabBuckets != 0) return false
        // the batch's own buckets, from the fused collect
        val touched = touchedVb.toSet
        if (touched.isEmpty) return true
        val pb = (0 until buckets).filter(b => touched.contains(b % vocabBuckets))
        writer.read(spark, s"${name}_postings")
          .filter(col("term_bucket").cast("int").isin(pb: _*))
          .groupBy("term").agg(count(lit(1)).as("df"))
          .withColumn("vocab_bucket",
            pmod(xxhash64(col("term")), lit(vocabBuckets.toLong)).cast("int"))
          .repartition(col("vocab_bucket")) // one file per bucket dir
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("vocab_bucket")
          .parquet(writer.path(s"${name}_vocab"))
        true
        // (no bucket-delete sweep: append deltas are positive, so the
        // crashed merge can never have emptied a bucket)
      }

      // ---- step 3: vocab + stats under the write-ahead dirty flag ----
      val statsP = path(s"${name}_stats")
      val dirtyState: Option[Seq[String]] =
        if (fs.exists(dirty)) Some(IndexProtocol.readLines(fs, dirty))
        else None
      // stale flag from a crash between a PREVIOUS batch's marker and
      // its clear: that batch's merge completed (marker is written
      // after vocab/stats), so the flag is litter, not damage
      val live = dirtyState.filter { st =>
        val ok = st.headOption.exists(_.toLong == batchId)
        if (!ok) {
          val prev = st.headOption.map(_.toLong).getOrElse(-1L)
          require(IndexProtocol.isMarked(fs, commitsDir, s"batch_$prev",
              "frontier_batch", prev),
            s"appendBm25IndexBatch($name): dirty flag names batch $prev " +
              s"with no commit marker while batch $batchId is applying — " +
              "two writers on one index?")
          fs.delete(dirty, false)
        }
        ok
      }
      live match {
        case None if !fs.exists(statsP) =>
          // BOOTSTRAP, first attempt: declare dirty BEFORE deriving
          IndexProtocol.writeLinesAtomic(fs, dirty,
            Seq(batchId.toString, "bootstrap"))
          rebuildAllFromPostings()
        case Some(st) if st.lift(1).contains("bootstrap") =>
          // crashed bootstrap: exact rebuild (batch-sized postings)
          rebuildAllFromPostings()
        case Some(st) =>
          // crashed incremental merge: bucket-scoped repair + stats
          // from the flag's pre-merge snapshot + the batch contribution
          val Array(n0, s0) = st(1).split("\t").map(_.toLong)
          if (recoverTouchedVocabBuckets()) writeStats(n0 + bStat._1, s0 + bStat._2)
          else rebuildAllFromPostings() // non-divisible bucket layout
        case None =>
          // incremental: snapshot pre-merge stats INTO the flag first
          val (n0, s0) = readStatsDirect(writer, name)
          IndexProtocol.writeLinesAtomic(fs, dirty,
            Seq(batchId.toString, s"$n0\t$s0"))
          mergeVocab(spark, writer, name,
            tfB.groupBy("term").agg(count(lit(1)).as("df_delta")),
            vocabBuckets,
            (o, delta) => coalesce(o, lit(0L)) + coalesce(delta, lit(0L)),
            touchedOpt = Some(touchedVb))
          writeStats(n0 + bStat._1, s0 + bStat._2)
      }
      // ---- step 4: commit, then clear the flags ----
      // fence check at the point of no return: a writer fenced (lease
      // epoch bumped by a TTL successor) mid-protocol must NOT publish
      IndexProtocol.assertLease(fs, commitsDir, writerId, leaseEpoch,
        s"appendBm25IndexBatch($name)")
      fs.create(marker, true).close()
      fs.delete(dirty, false)
      fs.delete(stagedMf, false)
    } finally tfB.unpersist(blocking = false)
  }

  /** Reproduce — deterministically and protocol-faithfully — a crash of
    * [[appendBm25IndexBatch]] INSIDE the vocab merge: the batch's
    * postings are moved in behind their staged manifest (step 2,
    * verbatim), the dirty flag records the pre-merge stats snapshot
    * (step 3's write-ahead), and then the merge "dies" having damaged
    * exactly what a real crash can damage — the batch's own vocab
    * buckets and the stats table. No commit marker is written. This is
    * the adversarial state [[bm25ServingView]] must serve THROUGH
    * (snapshot readers see the pre-batch index bit-exactly) and
    * redelivery's bucket-scoped recovery must repair; it exists so the
    * q112 oracle entry and SnapshotReadSpec can pin both against a real
    * mid-protocol state. Nothing in the write path calls it.
    */
  private[graft] def injectCrashedBm25Append(newDocs: DataFrame,
      writer: graft.sources.TableWriter, name: String, batchId: Long,
      buckets: Int = 64, vocabBuckets: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    def path(p: String) = new org.apache.hadoop.fs.Path(writer.path(p))
    val fs = path(s"${name}_commits").getFileSystem(conf)
    val (n0, s0) = readStatsDirect(writer, name)
    // step 2: postings staged and moved in behind the staged manifest
    val tfB = postingsOf(newDocs, idCol, textCol)
      .withColumn("term_bucket",
        pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))
      .persist()
    try {
      val stage = path(s"__stage_b${batchId}_$name")
      tfB.repartition(col("term_bucket"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("term_bucket").parquet(stage.toString)
      IndexProtocol.moveStagedIn(fs, stage, path(s"${name}_postings"),
        partitionPrefix = "term_bucket=", batchPrefix = s"b$batchId-",
        manifest = path(s"${name}_commits/staged_$batchId"))
      // step 3's write-ahead, then the merge "crashes": every vocab
      // bucket the batch touches is damaged, stats are garbage
      IndexProtocol.writeLinesAtomic(fs, path(s"${name}_vocab_dirty"),
        Seq(batchId.toString, s"$n0\t$s0"))
      val touched = tfB
        .select(pmod(xxhash64(col("term")), lit(vocabBuckets.toLong))
          .cast("int").as("vb"))
        .distinct().collect().map(_.getInt(0))
      val vroot = path(s"${name}_vocab")
      touched.foreach(b =>
        fs.delete(new org.apache.hadoop.fs.Path(vroot, s"vocab_bucket=$b"),
          true))
      writer.materialize(s"${name}_stats",
        Seq((-1L, -1L)).toDF("n_docs", "sum_dl"))
    } finally tfB.unpersist(blocking = false)
  }

  /** Positional twin of [[injectCrashedBm25Append]]: the batch's
    * position postings moved in behind their staged manifest, no commit
    * marker — the family has no derived tables, so this IS every
    * pre-marker crash state with data on disk. Fixture for q113 and
    * SnapshotReadSpec; nothing in the write path calls it.
    */
  private[graft] def injectCrashedPositionalAppend(newDocs: DataFrame,
      writer: graft.sources.TableWriter, name: String, batchId: Long,
      buckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = newDocs.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    def path(p: String) = new org.apache.hadoop.fs.Path(writer.path(p))
    val fs = path(s"${name}_pos_commits").getFileSystem(conf)
    val stage = path(s"__stage_pb${batchId}_$name")
    positionalPostings(newDocs, buckets, idCol, textCol)
      .repartition(col("term_bucket"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("term_bucket").parquet(stage.toString)
    IndexProtocol.moveStagedIn(fs, stage, path(s"${name}_positions"),
      partitionPrefix = "term_bucket=", batchPrefix = s"b$batchId-",
      manifest = path(s"${name}_pos_commits/staged_$batchId"))
  }

  /** Fold a quiescent BM25 index's per-batch commit markers into the
    * frontier files ([[IndexProtocol.compactCommitMarkers]]) — run it on
    * the maintenance cadence alongside file compaction so the commits
    * dir stays O(1) names instead of one marker per batch ever ingested.
    * Serving and redelivery semantics are unchanged: `id ≤ frontier`
    * answers exactly what the deleted markers did (monotone batch ids).
    */
  def compactBm25IndexCommits(spark: org.apache.spark.sql.SparkSession,
      writer: graft.sources.TableWriter, name: String): Unit = {
    val d = new org.apache.hadoop.fs.Path(writer.path(s"${name}_commits"))
    val fs = d.getFileSystem(spark.sessionState.newHadoopConf())
    IndexProtocol.compactCommitMarkers(fs, d, dirtyPath = Some(
      new org.apache.hadoop.fs.Path(writer.path(s"${name}_vocab_dirty"))))
  }

  def compactPositionalIndexCommits(spark: org.apache.spark.sql.SparkSession,
      writer: graft.sources.TableWriter, name: String): Unit = {
    val d = new org.apache.hadoop.fs.Path(writer.path(s"${name}_pos_commits"))
    IndexProtocol.compactCommitMarkers(
      d.getFileSystem(spark.sessionState.newHadoopConf()), d)
  }

  /** Hand over a BM25 index's single-writer lease (see
    * [[IndexProtocol.acquireLease]]): only safe once the owning stream
    * is stopped; the next [[appendBm25IndexBatch]] caller of ANY
    * writerId may then acquire. The positional twin is
    * [[releasePositionalWriterLease]].
    */
  def releaseBm25WriterLease(spark: org.apache.spark.sql.SparkSession,
      writer: graft.sources.TableWriter, name: String): Unit = {
    val d = new org.apache.hadoop.fs.Path(writer.path(s"${name}_commits"))
    IndexProtocol.releaseLease(
      d.getFileSystem(spark.sessionState.newHadoopConf()), d)
  }

  def releasePositionalWriterLease(spark: org.apache.spark.sql.SparkSession,
      writer: graft.sources.TableWriter, name: String): Unit = {
    val d = new org.apache.hadoop.fs.Path(writer.path(s"${name}_pos_commits"))
    IndexProtocol.releaseLease(
      d.getFileSystem(spark.sessionState.newHadoopConf()), d)
  }

  /** Targeted delete from a persisted BM25 index — the lexical twin of
    * the ANN deletion lifecycle (v17), and the stronger form: every
    * update is integer subtraction (postings struck, dfs decremented,
    * zero-df terms dropped, stats reduced), so delete == rebuild-
    * without-victims BIT-exactly, not just rank-equal. Victims arrive
    * WITH their text (the corpus table has it), which is what keeps the
    * rewrite pruned: a victim's postings live exactly in the buckets
    * its own terms hash into, so only those partitions are read, and of
    * those only partitions actually holding victim rows are rewritten.
    * A presence guard (victim ids ∩ pruned postings) makes absent ids
    * and re-deletes complete no-ops — without it a re-delete would
    * silently corrupt the df/stat decrements. Cost tracks the victims'
    * vocabulary, not the corpus vocabulary (on a real Zipf vocabulary a
    * small victim set touches few buckets; a tiny synthetic vocabulary
    * touches them all — the honest worst case).
    *
    * The df/dl/n_docs decrements are aggregated FROM THE STRUCK INDEX
    * ROWS (the pruned postings semi-joined with the presence set), not
    * from re-tokenizing the caller-supplied victim text: if the passed
    * text drifted from what was indexed, text-derived decrements would
    * subtract the wrong terms and lengths from vocab/stats while the
    * postings strike removed different rows — silent index corruption.
    * Deriving both sides from the same struck rows keeps postings,
    * vocab, and stats mutually consistent no matter what text the
    * caller passed; the victim text only PRUNES which buckets are
    * probed (with drifted text, postings in unpredicted buckets can
    * survive — but the index stays internally consistent).
    *
    * This plain form is a single-writer MAINTENANCE operation with no
    * protocol files, so snapshot readers ([[bm25ServingView]]) cannot
    * detect it mid-flight — schedule it in a reader-quiet window. The
    * CDC/streaming path uses [[deleteFromBm25IndexBatch]], whose
    * write-ahead state both makes crashes replayable and fences
    * concurrent snapshot readers (loud refusal, never a half-deleted
    * read).
    */
  def deleteFromBm25Index(victims: DataFrame,
      writer: graft.sources.TableWriter, name: String, buckets: Int = 64,
      vocabBuckets: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = victims.sparkSession
    import spark.implicits._
    val tfV0 = postingsOf(victims, idCol, textCol)
      .withColumn("term_bucket",
        pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))
    // bounded collect: ≤ buckets ids — the victims' own term buckets
    val affected = tfV0.select("term_bucket").distinct()
      .collect().map(_.getInt(0))
    if (affected.isEmpty) return
    val postPath = writer.path(s"${name}_postings")
    val pruned = spark.read.parquet(postPath)
      .withColumn("term_bucket", col("term_bucket").cast("int"))
      .filter(col("term_bucket").isin(affected.toIndexedSeq: _*))
    // the struck rows — the victims' actual postings in the probed
    // buckets — are STAGED TO DISK, not persist()ed: their lineage reads
    // the postings path this delete is about to overwrite, and a
    // cache-miss recomputation after the overwrite would read deleted
    // files — the file-backed copy severs the lineage (delta-sized, no
    // driver collect). Every decrement below aggregates these rows.
    val struckStage = writer.path(s"__stage_struck_$name")
    pruned
      .join(victims.select(col(idCol).as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(struckStage)
    val struck = spark.read.parquet(struckStage)
    try {
      if (struck.isEmpty) return
      // postings: rewrite only buckets that actually hold victim rows
      // (bounded collect: ≤ buckets ids)
      val hit = struck.select("term_bucket").distinct()
        .collect().map(_.getInt(0))
      val survivors = pruned
        .filter(col("term_bucket").isin(hit.toIndexedSeq: _*))
        .join(struck.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      // stage-then-swap (TableWriter.swapStagedDirs): survivors written
      // ONCE, partitioned, instead of flat-stage + read-back + dynamic
      // overwrite (twice the bytes plus an extra read and collect job)
      val stage = writer.path(s"__stage_del_$name")
      val stageP = new org.apache.hadoop.fs.Path(stage)
      val root = new org.apache.hadoop.fs.Path(postPath)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      val surviving: Set[Int] = try {
        survivors.repartition(col("term_bucket")) // one file per bucket
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("term_bucket")
          .parquet(stage)
        graft.sources.TableWriter
          .swapStagedDirs(fs, stageP, root, "term_bucket=").toSet
      } finally {
        fs.delete(stageP, true)
      }
      hit.filterNot(surviving).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"term_bucket=$b"), true)
      }

      // vocab: dfs decremented by the struck per-term doc counts (struck
      // rows are one per (term, doc), so count(*) per term IS the df
      // decrement); terms nobody holds anymore disappear, and only the
      // struck terms' vocab buckets rewrite
      mergeVocab(spark, writer, name,
        struck.groupBy("term").agg(count(lit(1)).as("df_delta")),
        vocabBuckets,
        // a delta term absent from the vocab would be an inconsistency
        // upstream; coalesce keeps the arithmetic total regardless
        (old, delta) => coalesce(old, lit(0L)) - coalesce(delta, lit(0L)))

      // stats: two longs down, mirror of append's two longs up — the dl
      // is the INDEXED document length riding the struck rows, distinct
      // per (doc_id, dl), consistent with what build/append summed
      val (oldN, oldS) = readStatsDirect(writer, name)
      val b = struck.select(col("doc_id"), col("dl")).distinct()
        .agg(count(lit(1)).as("n"), sum(col("dl")).cast("long").as("s"))
        .collect()(0)
      writer.materialize(s"${name}_stats",
        Seq((oldN - b.getAs[Long]("n"), oldS - b.getAs[Long]("s")))
          .toDF("n_docs", "sum_dl"))
    } finally {
      val sp = new org.apache.hadoop.fs.Path(struckStage)
      sp.getFileSystem(spark.sessionState.newHadoopConf()).delete(sp, true)
    }
  }

  /** EXACTLY-ONCE batch delete from a persisted BM25 index — the delete
    * leg of the streamed-maintenance protocol ([[appendBm25IndexBatch]]
    * is the append leg; together they let a CDC feed drive the index,
    * [[syncBm25IndexFromFeed]]). A plain [[deleteFromBm25Index]] is NOT
    * crash-safe: its df/stats decrements derive from the struck rows,
    * and a crash after the postings strike but before the decrements
    * leaves rows gone with vocab/stats never repaired — the redelivery
    * finds no victims and no-ops, permanently inconsistent. This
    * variant write-aheads everything the replay needs:
    *
    *   1. `{name}_commits/del_<id>` marker present → done (fast path).
    *   2. STRUCK-SET WRITE-AHEAD: the victims' actual index rows are
    *      computed from the (pre-strike) postings and persisted to
    *      `{name}_commits/struck_<id>` via stage+dir-rename — the one
    *      computation that must see pre-state exactly once. Replays
    *      REUSE the persisted set, never recompute.
    *   3. STATS SNAPSHOT WRITE-AHEAD (`delstate_<id>`): pre-delete
    *      (n_docs, sum_dl), written before any mutation.
    *   4. strike postings — idempotent given the persisted struck set
    *      (anti-join converges from any partial state);
    *   5. vocab: the struck terms' buckets are RECOMPUTED from the
    *      post-strike postings (exact and idempotent — no decrement
    *      arithmetic to double-apply; buckets % vocabBuckets == 0
    *      prunes the recompute to the ≡-mod postings buckets, else the
    *      whole vocab rebuilds), emptied buckets deleted;
    *   6. stats = snapshot − the struck set's own (n, Σdl);
    *   7. marker, then the write-ahead files clear.
    *
    * Same single-writer lease and in-order-replay contract as the
    * append leg: a crashed delete is redelivered BEFORE any later
    * append touches the index (the streaming engine replays the failed
    * epoch first), so the append never merges into a half-deleted
    * vocab. IndexRestartSpec crashes each step and diffs.
    */
  def deleteFromBm25IndexBatch(victims: DataFrame,
      writer: graft.sources.TableWriter, name: String, batchId: Long,
      buckets: Int = 64, vocabBuckets: Int = 16,
      idCol: String = "doc_id", textCol: String = "text",
      writerId: String = "default"): Unit = {
    val spark = victims.sparkSession
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    def path(p: String) = new org.apache.hadoop.fs.Path(writer.path(p))
    val commitsDir = path(s"${name}_commits")
    val fs = commitsDir.getFileSystem(conf)
    val leaseEpoch = IndexProtocol.acquireLease(fs, commitsDir, writerId,
      s"deleteFromBm25IndexBatch($name)")
    val marker = path(s"${name}_commits/del_$batchId")
    val state = path(s"${name}_commits/delstate_$batchId")
    val struckDir = path(s"${name}_commits/struck_$batchId")
    def cleanup(): Unit = {
      fs.delete(state, false); fs.delete(struckDir, true)
    }
    if (IndexProtocol.isMarked(fs, commitsDir, s"del_$batchId",
        "frontier_del", batchId)) { cleanup(); return }
    val postRoot = path(s"${name}_postings")
    if (!fs.exists(postRoot)) { // empty index: deleting nothing is done
      fs.create(marker, true).close(); return
    }

    // ---- step 2: struck-set write-ahead (pre-strike truth, once) ----
    if (!fs.exists(struckDir)) {
      val tfV = postingsOf(victims, idCol, textCol)
        .withColumn("term_bucket",
          pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))
      // bounded collect: ≤ buckets ids — the victims' own term buckets
      val affected = tfV.select("term_bucket").distinct()
        .collect().map(_.getInt(0))
      val stage = path(s"__stage_struck_b${batchId}_$name")
      val struck0 =
        if (affected.isEmpty)
          spark.read.parquet(postRoot.toString).limit(0)
        else spark.read.parquet(postRoot.toString)
          .withColumn("term_bucket", col("term_bucket").cast("int"))
          .filter(col("term_bucket").isin(affected.toIndexedSeq: _*))
          .join(victims.select(col(idCol).as("doc_id")).distinct(),
            Seq("doc_id"), "left_semi")
      struck0.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(stage.toString)
      if (!fs.rename(stage, struckDir))
        throw new java.io.IOException(
          s"deleteFromBm25IndexBatch: rename $stage -> $struckDir failed")
    }
    val struck = spark.read.parquet(struckDir.toString)
    if (struck.isEmpty) { // absent ids / re-deletes: byte-level no-op
      fs.create(marker, true).close(); cleanup(); return
    }

    // ---- step 3: stats snapshot write-ahead (pre-delete, once) ----
    if (!fs.exists(state)) {
      val (oldN, oldS) = readStatsDirect(writer, name)
      IndexProtocol.writeLinesAtomic(fs, state, Seq(s"$oldN\t$oldS"))
    }
    val Array(n0, s0) =
      IndexProtocol.readLines(fs, state).head.split("\t").map(_.toLong)

    // ---- step 4: strike postings (idempotent vs the persisted set) ----
    // bounded collect: ≤ buckets ids actually holding victim rows
    val hit = struck.select("term_bucket").distinct()
      .collect().map(_.getInt(0))
    val pruned = spark.read.parquet(postRoot.toString)
      .withColumn("term_bucket", col("term_bucket").cast("int"))
      .filter(col("term_bucket").isin(hit.toIndexedSeq: _*))
    val survivors = pruned
      .join(struck.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    // stage-then-swap (TableWriter.swapStagedDirs): survivors written
    // ONCE, partitioned — see [[deleteFromBm25Index]]. Idempotent under
    // replay: re-running the strike from any partial state re-stages
    // the same survivors and re-swaps.
    val stage = path(s"__stage_delb${batchId}_$name")
    val surviving: Set[Int] = try {
      survivors.repartition(col("term_bucket")) // one file per bucket
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .partitionBy("term_bucket")
        .parquet(stage.toString)
      graft.sources.TableWriter
        .swapStagedDirs(fs, stage, postRoot, "term_bucket=").toSet
    } finally fs.delete(stage, true)
    hit.filterNot(surviving).foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(postRoot, s"term_bucket=$b"),
        true)
    }

    // ---- step 5: recompute the struck terms' vocab buckets (exact,
    // idempotent — replaces decrement arithmetic entirely) ----
    // bounded collect: ≤ vocabBuckets ids
    val touchedVb = struck
      .select(pmod(xxhash64(col("term")), lit(vocabBuckets.toLong))
        .cast("int").as("vb"))
      .distinct().collect().map(_.getInt(0)).toSet
    val vocabPath = writer.path(s"${name}_vocab")
    if (buckets % vocabBuckets == 0) {
      val pb = (0 until buckets).filter(b => touchedVb.contains(b % vocabBuckets))
      val recomputed = spark.read.parquet(postRoot.toString)
        .withColumn("term_bucket", col("term_bucket").cast("int"))
        .filter(col("term_bucket").isin(pb: _*))
        .groupBy("term").agg(count(lit(1)).as("df"))
        .withColumn("vocab_bucket",
          pmod(xxhash64(col("term")), lit(vocabBuckets.toLong)).cast("int"))
        .persist()
      try {
        // bounded collect: ≤ vocabBuckets ids with surviving terms
        val survivingVb = recomputed.select("vocab_bucket").distinct()
          .collect().map(_.getInt(0)).toSet
        if (survivingVb.nonEmpty)
          recomputed.repartition(col("vocab_bucket"))
            .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("vocab_bucket")
            .parquet(vocabPath)
        // a touched bucket with NO surviving terms: dynamic overwrite
        // cannot write an empty partition — drop the stale dir
        val vroot = new org.apache.hadoop.fs.Path(vocabPath)
        touchedVb.filterNot(survivingVb).foreach { b =>
          fs.delete(new org.apache.hadoop.fs.Path(vroot, s"vocab_bucket=$b"),
            true)
        }
      } finally recomputed.unpersist(blocking = false)
    } else {
      // non-divisible layout: exact full rebuild from the postings
      writer.materialize(s"${name}_vocab_next",
        spark.read.parquet(postRoot.toString)
          .groupBy("term").agg(count(lit(1)).as("df"))
          .withColumn("vocab_bucket",
            pmod(xxhash64(col("term")), lit(vocabBuckets.toLong)).cast("int"))
          .repartition(col("vocab_bucket")),
        partitionBy = Seq("vocab_bucket"))
      val vDst = path(s"${name}_vocab")
      fs.delete(vDst, true)
      fs.rename(path(s"${name}_vocab_next"), vDst)
    }

    // ---- step 6: stats from the snapshot + the struck set ----
    val b = struck.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).as("n"), sum(col("dl")).cast("long").as("s"))
      .collect()(0)
    writer.materialize(s"${name}_stats",
      Seq((n0 - b.getAs[Long]("n"), s0 - b.getAs[Long]("s")))
        .toDF("n_docs", "sum_dl"))

    // ---- step 7: commit, clear the write-ahead files ----
    IndexProtocol.assertLease(fs, commitsDir, writerId, leaseEpoch,
      s"deleteFromBm25IndexBatch($name)")
    fs.create(marker, true).close()
    cleanup()
  }

  /** Drive a BM25 serving index from a table's CDC change feed
    * ([[graft.sources.TableWriter.mergeByKeyCdc]] /
    * `deleteByKeyCdc` write it) — the DB→search-index replication
    * pattern: per feed batch, in batch_id order, the PRE-images
    * (update_pre, delete) are struck via [[deleteFromBm25IndexBatch]]
    * and the POST-images (insert, update_post) appended via
    * [[appendBm25IndexBatch]], each leg exactly-once under its own
    * marker, so a re-run (or a crash anywhere inside any batch) resumes
    * and converges — the synced index serves bit-identically to one
    * built from the final table state (q109's oracle; CdcIndexSyncSpec
    * diffs against a fresh build). The feed carries pre-image TEXT, so
    * the delete prunes to the victims' true term buckets without
    * touching the table. Cost per batch tracks the batch (both legs are
    * bucket-pruned); the feed read is the batch's own directory.
    *
    * WHY batch order is load-bearing (and why there is deliberately no
    * readStream variant over the feed files): an UPDATE's pre-image
    * must strike BEFORE its post-image appends — applied reversed, the
    * strike removes the freshly-appended new rows and the document is
    * lost. Spark's file stream source orders by file, not by feed
    * batch, and a multi-file batch can split across microbatches (half
    * a delete leg would commit its marker and skip the rest). Feed
    * batch ids are the ordering contract; a streaming deployment gets
    * it from an offset-ordered log (Kafka), not directory listings.
    */
  def syncBm25IndexFromFeed(spark: org.apache.spark.sql.SparkSession,
      writer: graft.sources.TableWriter, tableName: String,
      indexName: String, buckets: Int = 64, vocabBuckets: Int = 16,
      keyCol: String = "doc_id", textCol: String = "text",
      writerId: String = "default"): Unit = {
    // bounded collect: one id per feed batch
    val batchIds = writer.readChangeFeed(spark, tableName)
      .select("batch_id").distinct().collect().map(_.getLong(0)).sorted
    for (bid <- batchIds) {
      val batch = spark.read.parquet(
        writer.path(s"${tableName}_changes") + s"/batch=$bid")
      deleteFromBm25IndexBatch(
        batch.filter(col("change_op").isin("update_pre", "delete"))
          .select(col(keyCol), col(textCol)),
        writer, indexName, bid, buckets, vocabBuckets, keyCol, textCol,
        writerId)
      appendBm25IndexBatch(
        batch.filter(col("change_op").isin("insert", "update_post"))
          .select(col(keyCol), col(textCol)),
        writer, indexName, bid, buckets, vocabBuckets, keyCol, textCol,
        writerId)
    }
  }

  /** Targeted delete from a positional index — the third and SIMPLEST
    * of the index deletions (v17 ANN, v18 BM25, this): positional
    * postings are pure per-(term, doc) state with no cross-document
    * statistics, so striking the victims' rows IS the whole delete and
    * delete == rebuild-without-victims bit-exactly with nothing to
    * merge. Same pruning discipline as [[deleteFromBm25Index]]: a
    * victim's rows live exactly in its own terms' buckets, presence is
    * disk-staged (severing lineage through the path being overwritten),
    * absent ids and re-deletes are byte-level no-ops.
    */
  def deleteFromPositionalIndex(victims: DataFrame,
      writer: graft.sources.TableWriter, name: String, buckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = victims.sparkSession
    val vb = victims
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(split(col(textCol), " "))).as("term"))
      .select(pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int")
        .as("term_bucket"))
    // bounded collect: ≤ buckets ids — the victims' own term buckets
    val affected = vb.distinct().collect().map(_.getInt(0))
    if (affected.isEmpty) return
    val posPath = writer.path(s"${name}_positions")
    val pruned = spark.read.parquet(posPath)
      .withColumn("term_bucket", col("term_bucket").cast("int"))
      .filter(col("term_bucket").isin(affected.toIndexedSeq: _*))
    val presentStage = writer.path(s"__stage_delids_$name")
    pruned.select("doc_id").distinct()
      .join(victims.select(col(idCol).as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(presentStage)
    val present = spark.read.parquet(presentStage)
    try {
      if (present.count() == 0L) return
      // bounded collect: ≤ buckets ids actually holding victim rows
      val hit = pruned.join(present, Seq("doc_id"), "left_semi")
        .select("term_bucket").distinct().collect().map(_.getInt(0))
      val survivors = pruned
        .filter(col("term_bucket").isin(hit.toIndexedSeq: _*))
        .join(present, Seq("doc_id"), "left_anti")
      val stage = writer.path(s"__stage_del_$name")
      val surviving: Set[Int] = try {
        survivors.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(stage)
        val staged = spark.read.parquet(stage)
        staged.repartition(col("term_bucket"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("term_bucket")
          .parquet(posPath)
        staged.select("term_bucket").distinct().collect()
          .map(_.getInt(0)).toSet
      } finally {
        val sp = new org.apache.hadoop.fs.Path(stage)
        sp.getFileSystem(spark.sessionState.newHadoopConf()).delete(sp, true)
      }
      val root = new org.apache.hadoop.fs.Path(posPath)
      val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
      hit.filterNot(surviving).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"term_bucket=$b"), true)
      }
    } finally {
      val sp = new org.apache.hadoop.fs.Path(presentStage)
      sp.getFileSystem(spark.sessionState.newHadoopConf()).delete(sp, true)
    }
  }

  private def emptyServing(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Int, Long)].toDF("query_id", "doc_id", "rank", "n_hit")
  }

  private val StagedTermBucketRe = "/term_bucket=(\\d+)/".r.unanchored

  /** SNAPSHOT-RESOLVED serving view of a BM25 index — readers see
    * exactly the state of the last batch whose commit marker exists,
    * whatever the writer is doing or wherever it crashed. Without this,
    * a reader racing [[appendBm25IndexBatch]] (or serving between a
    * crash and its redelivery) would dirty-read the batch's already-
    * renamed `b<id>-` postings against pre-merge vocab/stats — scores
    * from a state no commit ever defined.
    *
    * Resolution rules, all driven by the protocol's own write-ahead
    * state (one commits-dir listing + one flag read; the quiescent path
    * adds NO per-row work and leaves the plan untouched):
    *   - postings: the scan is pinned under the
    *     [[IndexProtocol.pinnedSnapshot]] race-closing dance, and files
    *     of staged-but-unmarked batches are excluded by their `b<id>-`
    *     names (the staged manifest is written before any rename, so
    *     every file such a batch can have landed is excludable);
    *   - stats: a LIVE dirty flag (its batch unmarked) carries the
    *     pre-merge (n_docs, sum_dl) snapshot — the committed values —
    *     so the possibly-mid-overwrite stats table is not read at all;
    *   - dfs: a crashed merge can only have damaged the vocab buckets
    *     the batch's vocabulary hashes into (derived from the staged
    *     manifest's `term_bucket=` paths); query terms in those buckets
    *     get their dfs RECOMPUTED from the committed postings (the same
    *     pruned scan shape the query itself runs), terms elsewhere read
    *     the untouched vocab buckets normally;
    *   - a live BOOTSTRAP dirty flag means no batch has ever committed:
    *     the committed state is an empty index, and the reader serves
    *     exactly that (None → empty result);
    *   - in-flight DELETE legs refuse loudly (in-place rewrites have no
    *     pre-image) — the delete protocols' write-ahead files make them
    *     detectable; plain [[deleteFromBm25Index]]/compaction are
    *     operator-scheduled maintenance outside this guarantee.
    *
    * Returns (pruned-committed-postings-for-terms, nDocs, avgdl, dfs);
    * None when the committed state is an unborn index.
    */
  private def bm25ServingView(spark: org.apache.spark.sql.SparkSession,
      writer: graft.sources.TableWriter, name: String, qTerms: Seq[String],
      buckets: Int, vocabBuckets: Int):
      Option[(Seq[String] => DataFrame, Long, Double, Map[String, Long])] = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    def path(p: String) = new org.apache.hadoop.fs.Path(writer.path(p))
    val commitsDir = path(s"${name}_commits")
    val fs = commitsDir.getFileSystem(conf)
    val dirtyP = path(s"${name}_vocab_dirty")
    def dirtyLines(): Seq[String] =
      IndexProtocol.readLinesIfExists(fs, dirtyP).getOrElse(Nil)

    val (base, state, dirty) = IndexProtocol.pinnedSnapshot(fs, commitsDir,
      () => dirtyLines(),
      () => writer.read(spark, s"${name}_postings"),
      s"queryBm25Index($name)")

    // bucket list via the driver-side xxhash64 replica ([[termBucket]] —
    // no Spark job at all; the max-score path calls this closure three
    // times per serve, and each former "local-data job" was a fixed
    // driver round trip that amplified under box contention). The
    // pruning predicate stays in the partition column's written type
    // (int), so pruning stays cast-free; the uncommitted-file exclusion
    // wraps the PRUNED scan (input_file_name is nondeterministic —
    // below it, the prune would not push down)
    val posts: Seq[String] => DataFrame = terms =>
      if (terms.isEmpty) base.limit(0)
      else IndexProtocol.excludeUncommitted(
        base.filter(col("term_bucket").isin(termBuckets(terms, buckets): _*)
          && col("term").isin(terms: _*)),
        state.uncommittedAppends)

    val liveDirty = dirty.nonEmpty &&
      dirty.headOption.exists(h => !state.isCommitted(h.toLong))
    if (liveDirty && dirty.lift(1).contains("bootstrap"))
      return None // no batch ever committed: the snapshot is an empty index

    // clean path: stats (one row) and the query terms' dfs come back in
    // ONE collect — the two frames are tiny, and fusing them halves the
    // serve's driver round trips (fixed per-serve job submissions are
    // the contention amplifier, r10 verdict #1). The stats row rides
    // under a space-containing pseudo-term no real term can collide
    // with (terms come from splitting on space, so they never contain
    // one; an empty corpus has no terms at all).
    val (nDocs, avgdl, dfs): (Long, Double, Map[String, Long]) =
      if (!liveDirty) {
        val statsRow = writer.read(spark, s"${name}_stats")
          .select(lit(" stats ").as("term"), col("n_docs").as("a"),
            col("sum_dl").as("b"))
        val vocabRows = vocabPruned(spark, writer, name, qTerms, vocabBuckets)
          .select(col("term"), col("df").as("a"), lit(0L).as("b"))
        val all = vocabRows.unionAll(statsRow).collect()
          .map(r => (r.getAs[String]("term"), r.getAs[Long]("a"),
            r.getAs[Long]("b")))
        val (statRows, dfRows) = all.partition(_._1 == " stats ")
        val (n, s) = statRows.headOption.map(t => (t._2, t._3))
          .getOrElse((0L, 0L))
        if (n <= 0L) return None
        (n, s.toDouble / n.toDouble,
          dfRows.map(t => t._1 -> t._2).toMap)
      } else {
        val Array(n0, s0) = dirty(1).split("\t").map(_.toLong)
        if (n0 <= 0L) return None
        (n0, s0.toDouble / n0.toDouble,
          dirtyDfs(spark, writer, name, qTerms, buckets, vocabBuckets,
            fs, dirty, posts))
      }
    Some((posts, nDocs, avgdl, dfs))
  }

  /** The dirty-flag serving path's df resolution, factored out of
    * [[bm25ServingView]]: clean vocab buckets are read normally, the
    * crashed batch's touched buckets get their dfs recomputed from the
    * committed postings. Rare path (only live while a crashed append
    * awaits redelivery) — not job-count-optimized.
    */
  private def dirtyDfs(spark: org.apache.spark.sql.SparkSession,
      writer: graft.sources.TableWriter, name: String, qTerms: Seq[String],
      buckets: Int, vocabBuckets: Int,
      fs: org.apache.hadoop.fs.FileSystem, dirty: Seq[String],
      posts: Seq[String] => DataFrame): Map[String, Long] = {
    def path(p: String): org.apache.hadoop.fs.Path =
      new org.apache.hadoop.fs.Path(writer.path(p))
        // the crashed merge can only have touched the batch's own vocab
        // buckets — derivable from its staged manifest (postings bucket b
        // holds terms of vocab bucket b % vocabBuckets when the layouts
        // divide); conservative all-buckets fallback otherwise
        val touchedVb: Set[Int] = {
          val mf = path(s"${name}_commits/staged_${dirty.head}")
          if (buckets % vocabBuckets == 0 && fs.exists(mf)) {
            IndexProtocol.readLines(fs, mf).filter(_.nonEmpty).flatMap { p =>
              StagedTermBucketRe.findFirstMatchIn(p)
                .map(_.group(1).toInt % vocabBuckets)
            }.toSet
          } else (0 until vocabBuckets).toSet
        }
        val (touchedTerms, cleanTerms) =
          qTerms.partition(t => touchedVb.contains(termBucket(t, vocabBuckets)))
        val cleanDfs: Map[String, Long] =
          if (cleanTerms.isEmpty) Map.empty
          else vocabPruned(spark, writer, name, cleanTerms, vocabBuckets)
            .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("df"))
            .toMap
        val touchedDfs: Map[String, Long] =
          if (touchedTerms.isEmpty) Map.empty
          else posts(touchedTerms).groupBy("term")
            .agg(count(lit(1)).as("df"))
            .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("df"))
            .toMap
        cleanDfs ++ touchedDfs
  }

  /** Query a persisted BM25 index: stats and the query terms' dfs are
    * tiny lookups; the one corpus-sized read is the postings scan,
    * partition-pruned to the term buckets the query vocabulary hashes
    * into and term-filtered inside them. Bit-identical ranking to
    * [[bm25TopK]] over the same corpus (postings are integers, parquet
    * round-trips them exactly, and the score arithmetic is shared).
    * Reads are SNAPSHOT-ISOLATED against the streamed-append protocol —
    * see [[bm25ServingView]].
    */
  def queryBm25Index(spark: org.apache.spark.sql.SparkSession,
      writer: graft.sources.TableWriter, name: String, queries: DataFrame,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false, buckets: Int = 64,
      vocabBuckets: Int = 16): DataFrame = {
    import spark.implicits._
    val (qRows, qTerms) = localQueries(queries)
    val qDf = qRows.toDF("query_id", "term")
    bm25ServingView(spark, writer, name, qTerms, buckets, vocabBuckets) match {
      case None => emptyServing(spark)
      case Some((posts, nDocs, avgdl, dfsMap)) =>
        val dfs = dfsMap.toSeq.sortBy(_._1)
        val cand = posts(qTerms)
          .join(broadcast(dfs.toDF("term", "df")), Seq("term"))
        scoreAndRank(cand, qDf, k, k1, b, nDocs, avgdl, excludeSelf)
    }
  }

  /** Rarest-first seed set for max-score serving: the minimal prefix of
    * terms, rarest first (df asc, term asc for determinism), whose
    * cumulative df reaches `k` — enough postings to yield k candidate
    * docs in the cheapest place possible. All terms if the query is too
    * sparse to promise k docs.
    */
  private[graft] def seedTerms(termDfs: Seq[(String, Long)],
      k: Int): Seq[String] = {
    val sorted = termDfs.sortBy { case (t, df) => (df, t) }
    val cum = sorted.scanLeft(0L)(_ + _._2).tail
    val idx = cum.indexWhere(_ >= k)
    if (idx < 0) sorted.map(_._1) else sorted.take(idx + 1).map(_._1)
  }

  /** Max-score essential-term partition (Turtle & Flood 1995): order the
    * query's terms by ascending score upper bound and drop the longest
    * prefix whose bounds sum to ≤ τ − slack; a doc containing ONLY
    * dropped (non-essential) terms scores strictly below every bound in
    * play — per-term BM25 partials are < maxImpact strictly (the tf
    * saturation never reaches 1) — so it scores < τ ≤ the true k-th
    * best and can never enter the top-k, tie-breaks included. The slack
    * (1e-9 relative) absorbs double-rounding of the bound arithmetic:
    * over-conservative pruning only costs speed, never exactness. τ =
    * −∞ (no reliable threshold) keeps every term essential — the plan
    * degrades to the unpruned one, bit-identically.
    */
  private[graft] def essentialTerms(impacts: Seq[(String, Double)],
      tau: Double): Seq[String] = {
    if (tau.isNegInfinity || impacts.isEmpty) impacts.map(_._1)
    else {
      val sorted = impacts.sortBy { case (t, i) => (i, t) }
      val slack = 1e-9 * (1.0 + math.abs(tau))
      var cum = 0.0
      val ess = Seq.newBuilder[String]
      var dropping = true
      for ((t, imp) <- sorted) {
        if (dropping && cum + imp <= tau - slack) cum += imp
        else { dropping = false; ess += t }
      }
      val out = ess.result()
      // the top-k docs themselves prove Σ impacts ≥ τ, so an all-pruned
      // partition can only be a borderline-rounding artifact — keep the
      // highest-impact term rather than reason about it
      if (out.isEmpty) Seq(sorted.last._1) else out
    }
  }

  /** Max-score BM25 serving over a [[buildBm25Index]] layout — EXACT
    * top-k, bit-identical ranking to [[queryBm25Index]], with the
    * candidate mass bounded by the DISCRIMINATIVE terms of each query
    * instead of the whole matching set. This is the high-df (stop-word)
    * serving fix: on the naive plan a query containing one stop word
    * drags every document holding it through the fold-and-rank shuffle;
    * here stop words are provably non-essential and only docs holding a
    * rarer, higher-impact term survive into the shuffle.
    *
    * Three candidate-bounded phases on top of the same index tables:
    *   1. SEED: per query, the rarest terms whose dfs promise k docs
    *      are scored alone (partial scores are a LOWER bound of full
    *      scores, and the k-th best over a subset lower-bounds the k-th
    *      best overall) → τ per query, a driver-side |queries|-row
    *      collect. Queries whose seeds yield fewer than k docs get
    *      τ = −∞ (no pruning — the safe degenerate).
    *   2. PARTITION: per-term upper bounds maxImpact = idf·(k1+1) from
    *      the vocab dfs (driver arithmetic); [[essentialTerms]] drops
    *      the stop-word prefix whose bounds cannot reach τ.
    *   3. SERVE: candidates = docs holding ≥1 essential term (a
    *      partition-pruned scan of the essential terms' buckets — the
    *      stop-word postings are never shuffled for candidacy); full
    *      scoring joins ALL query-term postings but semi-joins the
    *      candidate set BEFORE the fold shuffle, so the shuffle and
    *      window are candidate-bounded. Scoring arithmetic, decimal
    *      fold, and tie-breaks are shared with [[queryBm25Index]] —
    *      RetrievalSpec pins frame equality on randomized workloads and
    *      v21 pins it under the DuckDB oracle.
    *
    * The worst case is honest: a query of ONLY max-df terms on a flat
    * (non-Zipf) vocabulary has no non-essential prefix and degrades to
    * the naive plan — exact top-k genuinely requires scoring everything
    * when every term is a stop word and the corpus has no rarer signal.
    */
  def queryBm25IndexMaxScore(spark: org.apache.spark.sql.SparkSession,
      writer: graft.sources.TableWriter, name: String, queries: DataFrame,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false, buckets: Int = 64,
      vocabBuckets: Int = 16): DataFrame = {
    import spark.implicits._
    val (qRows, qTermsAll) = localQueries(queries)
    // snapshot-resolved index state — same contract as [[queryBm25Index]]
    val view = bm25ServingView(spark, writer, name, qTermsAll,
      buckets, vocabBuckets)
    if (view.isEmpty) return emptyServing(spark)
    val (prunedPosts, nDocs, avgdl, dfs) = view.get
    // vocabulary-absent terms match nothing — they carry no postings and
    // no df, so dropping them changes no score and no n_hit
    val qRowsIn = qRows.filter { case (_, t) => dfs.contains(t) }
    val byQ: Map[Long, Seq[String]] =
      qRowsIn.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    if (qRowsIn.isEmpty) return emptyServing(spark)

    def impact(t: String): Double =
      math.log((nDocs.toDouble - dfs(t).toDouble + 0.5)
        / (dfs(t).toDouble + 0.5) + 1.0) * (k1 + 1.0)

    // pruned postings scans come from the snapshot view (bucket-pruned,
    // term-filtered, uncommitted-batch files excluded)
    val dfDf = broadcast(dfs.toSeq.sortBy(_._1).toDF("term", "df"))
    def partials(workload: DataFrame, posts: DataFrame): DataFrame = {
      val scored0 = posts.join(dfDf, Seq("term"))
        .join(broadcast(workload), Seq("term"))
      (if (excludeSelf) scored0.filter(col("doc_id") =!= col("query_id"))
       else scored0)
        .withColumn("s",
          log((lit(nDocs.toDouble) - col("df").cast("double")
              + lit(0.5)) / (col("df").cast("double") + lit(0.5)) + lit(1.0))
            * (col("tf").cast("double") * lit(k1 + 1.0))
            / (col("tf").cast("double")
              + lit(k1) * (lit(1.0 - b)
                + lit(b) * col("dl").cast("double") / lit(avgdl))))
    }

    // phase 1: τ per query from seed-term partial scores
    val seeds: Seq[(Long, String)] = byQ.toSeq.flatMap { case (q, ts) =>
      seedTerms(ts.map(t => (t, dfs(t))), k).map(q -> _)
    }
    // bounded collect: one (n, kth) row per query; the seed candidates
    // rank through the bounded-heap aggregate (rankTopK), not a
    // per-query window — seed terms are the rarest but their dfs can
    // still be corpus-scaled
    val tauRows = rankTopK(
        partials(seeds.toDF("query_id", "term"),
            prunedPosts(seeds.map(_._2).distinct))
          .groupBy("query_id", "doc_id")
          .agg(sum(col("s").cast("decimal(38,18)")).as("score")),
        k, col("score"), lit(0L))
      .groupBy("query_id")
      .agg(max(col("rank")).as("n"), min(col("score")).cast("double").as("kth"))
      .collect()
      .map(r => r.getAs[Long]("query_id")
        -> (if (r.getAs[Int]("n") >= k) r.getAs[Double]("kth")
            else Double.NegativeInfinity)).toMap

    // phase 2: essential terms per query (driver arithmetic on ≤|q·terms|)
    val ess: Seq[(Long, String)] = byQ.toSeq.flatMap { case (q, ts) =>
      essentialTerms(ts.map(t => (t, impact(t))),
        tauRows.getOrElse(q, Double.NegativeInfinity)).map(q -> _)
    }

    // phase 3: candidate docs hold ≥1 essential term; full scoring is
    // semi-joined to them BEFORE the fold shuffle
    val essPosts = prunedPosts(ess.map(_._2).distinct)
      .join(broadcast(ess.toDF("query_id", "term")), Seq("term"))
    val cand = (if (excludeSelf)
        essPosts.filter(col("doc_id") =!= col("query_id")) else essPosts)
      .select("query_id", "doc_id").distinct()
    val full = partials(qRowsIn.toDF("query_id", "term"),
        prunedPosts(qRowsIn.map(_._2).distinct))
      .join(cand, Seq("query_id", "doc_id"), "left_semi")
    rankTopK(
        full.groupBy("query_id", "doc_id")
          .agg(count(lit(1)).cast("long").as("n_hit"),
            sum(col("s").cast("decimal(38,18)")).as("score")),
        k, col("score"), col("n_hit"))
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("payload").as("n_hit"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two rank frames,
    * each (query_id, <idCol>, rank): rrf = Σ 1/(rrfK + rank) over the
    * systems that returned the id, re-ranked to top-k. The two addends
    * are combined in a FIXED order (a then b), so the fused score is
    * bit-deterministic given integer input ranks.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, rrfK: Double = 60.0,
      idCol: String = "doc_id"): DataFrame = {
    def side(df: DataFrame, as: String): DataFrame =
      df.select(col("query_id"), col(idCol).as("id"), col("rank").as(as))
    val fused = side(a, "rank_a")
      .join(side(b, "rank_b"), Seq("query_id", "id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("rank_a").cast("double")),
          lit(0.0))
          + coalesce(lit(1.0) / (lit(rrfK) + col("rank_b").cast("double")),
            lit(0.0)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("id").asc)
    fused.withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= k)
      .select(col("query_id"), col("id").as(idCol), col("fused_rank"),
        col("rrf"), col("rank_a"), col("rank_b"))
  }

  /** Hashed TF-IDF document vectors (feature hashing, Weinberger et al.
    * 2009) — the text→vector bridge: each term is mapped to one of
    * `dims` buckets by the SHARED polynomial token hash (the d4/simhash
    * arithmetic, replayable in any 64-bit-integer SQL engine) and its
    * tf·idf weight accumulates there. Output is the SPARSE form —
    * (doc_id, dim, weight, n_terms) rows for occupied buckets only —
    * which is also what keeps the result hash-comparable (dense array
    * columns don't survive the cross-engine compare).
    *
    * Determinism: idf is the RATIONAL Laplace form (N+1)/(df+1) — no
    * transcendental, so the weights themselves are bit-exact across
    * engines (unlike BM25's ln-based scores); per-bucket accumulation is
    * an order-PINNED double fold (sorted by term) — NOT a decimal-cast
    * sum: a double's exact value can need ~50 fractional digits, so
    * DECIMAL(38,18) conversion rounds, and the two engines round that
    * conversion differently (~1e-15 relative, measured). That is
    * invisible behind BM25's rank-only contract but not here, where the
    * weight IS the output. Buckets hold 1–3 terms, so the fold costs
    * nothing.
    * Scale shape: one (doc, term) count shuffle with map-side combine, a
    * vocabulary-bounded df aggregate broadcast back, then one narrow
    * (doc, dim) combine-agg — nothing corpus-sized crosses the driver
    * (N arrives as one collected long).
    */
  def hashedTfidf(docs: DataFrame, dims: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val nDocs = docs.count()
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("term"))
      .withColumn("dim",
        graft.functions.TextFns.polyTokenHash(col("term")) % lit(dims.toLong))
      .withColumn("wt",
        col("tf").cast("double")
          * ((lit(nDocs.toDouble) + lit(1.0))
            / (col("df").cast("double") + lit(1.0))))
      .groupBy("doc_id", "dim")
      .agg(sort_array(collect_list(struct(col("term"), col("wt")))).as("arr"))
      .select(col("doc_id"), col("dim"),
        aggregate(col("arr"), lit(0.0),
          (acc, x) => acc + x.getField("wt")).as("weight"),
        size(col("arr")).cast("long").as("n_terms"))
  }

  /** Positional inverted index — the phrase-search extension of the BM25
    * serving layout: one postings row per (term, doc) carrying the
    * term's ORDERED 1-based position list, partitioned by
    * `term_bucket = pmod(xxhash64(term), buckets)` exactly like
    * [[buildBm25Index]] so a phrase query prunes to the buckets its
    * terms hash into. Build cost: ONE tokenize shuffle (map-side
    * position collect is not possible for collect_list, but the
    * (term, doc) key keeps every group within one document's token
    * count, so no group is corpus-sized). Positions are ints (2^31
    * tokens per document is beyond any real document).
    */
  private def positionalPostings(docs: DataFrame, buckets: Int,
      idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("p0", "term")))
      .groupBy("term", "doc_id")
      .agg(sort_array(collect_list((col("p0") + 1).cast("int")))
        .as("positions"))
      .withColumn("term_bucket",
        pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))

  def buildPositionalIndex(docs: DataFrame, writer: graft.sources.TableWriter,
      name: String, buckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): Unit =
    // same bucket-clustered write as the BM25 postings: one contiguous
    // file per bucket dir instead of tasks × buckets slivers
    writer.materialize(s"${name}_positions",
      positionalPostings(docs, buckets, idCol, textCol)
        .repartition(col("term_bucket")),
      partitionBy = Seq("term_bucket"))

  /** Incremental ingest into a positional index — the phrase-search leg
    * of the crawl-pattern family (v12 IVF, v13 BM25, this): a batch of
    * NEW documents is tokenized once and its postings appended into the
    * bucket-partitioned layout. Positional postings are pure per-(term,
    * doc) state — no cross-document statistics at all (unlike BM25's
    * dfs/avgdl) — so append == rebuild BIT-exactly with nothing to
    * merge: the strongest of the three append contracts. Bootstrap on
    * first batch, same as appendBm25Index.
    */
  def appendPositionalIndex(newDocs: DataFrame,
      writer: graft.sources.TableWriter, name: String, buckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val spark = newDocs.sparkSession
    val tblP = new org.apache.hadoop.fs.Path(
      writer.path(s"${name}_positions"))
    val exists = tblP.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(tblP)
    writer.materialize(s"${name}_positions",
      positionalPostings(newDocs, buckets, idCol, textCol)
        .repartition(col("term_bucket")),
      partitionBy = Seq("term_bucket"),
      mode = if (exists) org.apache.spark.sql.SaveMode.Append
             else org.apache.spark.sql.SaveMode.Overwrite)
  }

  /** EXACTLY-ONCE batch append into a positional index — the streaming
    * form of [[appendPositionalIndex]] (q107), and the SIMPLEST of the
    * three batch-commit protocols: positional postings are pure
    * per-(term, doc) state with nothing derived (no vocab, no stats),
    * so the whole protocol is the writer fence, the commit marker, and
    * the manifest-driven `b<id>-…` postings redo — any crash point
    * replays to identical bytes, a redelivered batch is a marker check.
    * Redo is O(batch): the staged-file manifest (written before any
    * rename) lists exactly the files a crashed attempt can have moved
    * in, so no bucket directory is ever listed.
    */
  def appendPositionalIndexBatch(newDocs: DataFrame,
      writer: graft.sources.TableWriter, name: String, batchId: Long,
      buckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text",
      writerId: String = "default"): Unit = {
    val spark = newDocs.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    def path(p: String) = new org.apache.hadoop.fs.Path(writer.path(p))
    val commitsDir = path(s"${name}_pos_commits")
    val fs = commitsDir.getFileSystem(conf)
    val leaseEpoch = IndexProtocol.acquireLease(fs, commitsDir, writerId,
      s"appendPositionalIndexBatch($name)")
    val marker = path(s"${name}_pos_commits/batch_$batchId")
    val stagedMf = path(s"${name}_pos_commits/staged_$batchId")
    if (IndexProtocol.isMarked(fs, commitsDir, s"batch_$batchId",
        "frontier_batch", batchId)) {
      fs.delete(stagedMf, false); return
    }
    val posRoot = path(s"${name}_positions")
    IndexProtocol.redoFromManifest(fs, stagedMf)
    val stage = path(s"__stage_pb${batchId}_$name")
    positionalPostings(newDocs, buckets, idCol, textCol)
      .repartition(col("term_bucket"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("term_bucket").parquet(stage.toString)
    IndexProtocol.moveStagedIn(fs, stage, posRoot,
      partitionPrefix = "term_bucket=", batchPrefix = s"b$batchId-",
      manifest = stagedMf)
    IndexProtocol.assertLease(fs, commitsDir, writerId, leaseEpoch,
      s"appendPositionalIndexBatch($name)")
    fs.create(marker, true).close()
    fs.delete(stagedMf, false)
  }

  /** EXACTLY-ONCE batch delete from a positional index — the delete leg
    * of the streamed phrase-index maintenance ([[appendPositionalIndexBatch]]
    * is the append leg; [[syncPositionalIndexFromFeed]] drives both from
    * a CDC feed). Positional postings are pure per-(term, doc) state, so
    * unlike the BM25 leg there is NOTHING derived to write-ahead: the
    * underlying [[deleteFromPositionalIndex]] converges from any partial
    * state (each run strikes whatever victim rows remain), and the
    * protocol is just the writer fence and the commit marker that makes
    * a redelivered batch a no-op.
    */
  def deleteFromPositionalIndexBatch(victims: DataFrame,
      writer: graft.sources.TableWriter, name: String, batchId: Long,
      buckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text",
      writerId: String = "default"): Unit = {
    val spark = victims.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    def path(p: String) = new org.apache.hadoop.fs.Path(writer.path(p))
    val commitsDir = path(s"${name}_pos_commits")
    val fs = commitsDir.getFileSystem(conf)
    val leaseEpoch = IndexProtocol.acquireLease(fs, commitsDir, writerId,
      s"deleteFromPositionalIndexBatch($name)")
    val marker = path(s"${name}_pos_commits/del_$batchId")
    if (IndexProtocol.isMarked(fs, commitsDir, s"del_$batchId",
        "frontier_del", batchId)) {
      // sweep a crash-between-marker-and-clear's stale reader fence
      fs.delete(path(s"${name}_pos_commits/delflag_$batchId"), false)
      return
    }
    if (fs.exists(path(s"${name}_positions"))) {
      // write-ahead in-progress flag: the strike rewrites bucket files in
      // place, so snapshot readers have no pre-image to fall back to —
      // the flag makes the window DETECTABLE and readers refuse loudly
      // instead of serving a half-deleted index. Cleared only after the
      // marker, so a crash anywhere inside keeps readers fenced until
      // the leg is redelivered.
      val flag = path(s"${name}_pos_commits/delflag_$batchId")
      fs.create(flag, true).close()
      deleteFromPositionalIndex(victims, writer, name, buckets,
        idCol, textCol)
      IndexProtocol.assertLease(fs, commitsDir, writerId, leaseEpoch,
        s"deleteFromPositionalIndexBatch($name)")
      fs.create(marker, true).close()
      fs.delete(flag, false)
    } else {
      IndexProtocol.assertLease(fs, commitsDir, writerId, leaseEpoch,
        s"deleteFromPositionalIndexBatch($name)")
      fs.create(marker, true).close()
    }
  }

  /** Drive a positional (phrase-search) index from a table's CDC change
    * feed — the phrase twin of [[syncBm25IndexFromFeed]]: per feed
    * batch in batch_id order, pre-images struck, post-images appended,
    * each leg exactly-once under its marker; re-runs fast-path and the
    * synced index matches a fresh build over the final table state
    * (q110's oracle).
    */
  def syncPositionalIndexFromFeed(spark: org.apache.spark.sql.SparkSession,
      writer: graft.sources.TableWriter, tableName: String,
      indexName: String, buckets: Int = 64,
      keyCol: String = "doc_id", textCol: String = "text",
      writerId: String = "default"): Unit = {
    // bounded collect: one id per feed batch
    val batchIds = writer.readChangeFeed(spark, tableName)
      .select("batch_id").distinct().collect().map(_.getLong(0)).sorted
    for (bid <- batchIds) {
      val batch = spark.read.parquet(
        writer.path(s"${tableName}_changes") + s"/batch=$bid")
      deleteFromPositionalIndexBatch(
        batch.filter(col("change_op").isin("update_pre", "delete"))
          .select(col(keyCol), col(textCol)),
        writer, indexName, bid, buckets, keyCol, textCol, writerId)
      appendPositionalIndexBatch(
        batch.filter(col("change_op").isin("insert", "update_post"))
          .select(col(keyCol), col(textCol)),
        writer, indexName, bid, buckets, keyCol, textCol, writerId)
    }
  }

  /** Exact phrase query against a [[buildPositionalIndex]] layout.
    * `phrases`: (query_id LONG, terms ARRAY<STRING>) — a bounded
    * serving-side workload, collected like [[localQueries]]. A document
    * matches when the phrase occurs CONSECUTIVELY: the occurrence-start
    * set is the intersection over phrase offsets i of
    * {p - i : p ∈ positions(term_i)}, computed entirely in Column
    * algebra (transform + array_intersect fold) — integers end-to-end,
    * so unlike BM25 the output is fully hash-exact cross-engine, not
    * rank-only. Output: (query_id, doc_id, n_occ, rank), rank 1..k by
    * occurrence count desc / doc_id asc.
    *
    * Plan shape: the postings read is partition-pruned to the query
    * terms' buckets and term-filtered inside them; the broadcast
    * (term, off) join fans each surviving posting to the offsets that
    * term occupies in some phrase; one (query, doc)-keyed shuffle
    * aggregates the offset sets; everything after is
    * candidate-bounded. Phrases with repeated terms work: each offset
    * is a distinct broadcast row, and the doc must satisfy ALL of them
    * (countDistinct(off) = phrase length).
    *
    * Rarest-term-first candidacy (the stop-word fix, twin of
    * [[queryBm25IndexMaxScore]]): a doc can only match a phrase if it
    * holds the phrase's RAREST term, so the (query, doc) shuffle is
    * semi-joined down to those docs before the offset sets aggregate —
    * candidate mass is bounded by the rarest term's df, not the
    * commonest's. Per-term dfs come from a count-only aggregate over
    * the pruned postings scan (map-side combined to ≤|query vocabulary|
    * rows — the scan of stop-word buckets still happens, but their
    * postings never enter the intersection shuffle). Exact by
    * construction (a match needs ALL phrase terms), so v14/v16/v20
    * hash-match the unpruned plan.
    */
  def phraseQuery(spark: org.apache.spark.sql.SparkSession,
      writer: graft.sources.TableWriter, name: String, phrases: DataFrame,
      k: Int, excludeSelf: Boolean = false, buckets: Int = 64): DataFrame = {
    import spark.implicits._
    val pRows = phrases
      .select(col("query_id").cast("long"), col("terms"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toSeq
    val qOff = pRows.flatMap { case (q, ts) =>
      ts.zipWithIndex.map { case (t, i) => (q, t, i, ts.length) } }
    val qDf = qOff.toDF("query_id", "term", "off", "plen")
    val qTerms = qOff.map(_._2).distinct.sorted
    // bucket ids via the driver-side xxhash64 replica (zero extra jobs
    // per serve), pruning predicate stays in the written int type —
    // same as queryBm25Index
    val hit = termBuckets(qTerms, buckets)
    // snapshot-resolved positions scan — the positional family has no
    // derived vocab/stats, so the whole guarantee is the pinned scan +
    // uncommitted-batch file exclusion + delete-leg refusal (see
    // [[bm25ServingView]] for the full rules on the BM25 family); the
    // per-term dfs below derive from this same committed view
    val posCommits = new org.apache.hadoop.fs.Path(
      writer.path(s"${name}_pos_commits"))
    val posFs = posCommits.getFileSystem(spark.sessionState.newHadoopConf())
    val (posBase, posState, _) = IndexProtocol.pinnedSnapshot(posFs,
      posCommits, () => Nil,
      () => writer.read(spark, s"${name}_positions"),
      s"phraseQuery($name)")
    val posts = IndexProtocol.excludeUncommitted(
        posBase.filter(col("term_bucket").isin(hit: _*)
          && col("term").isin(qTerms: _*)),
        posState.uncommittedAppends)
      .select(col("term"), col("doc_id"), col("positions"))
    // per-term document frequencies: bounded collect (≤ |qTerms| rows),
    // map-side combined — no positions shuffled, just counts
    val dfByTerm: Map[String, Long] = posts.groupBy("term")
      .agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rarest term per phrase (df asc, term asc for determinism); a term
    // absent from the index has df 0 — the phrase matches nothing and
    // its rarest-term candidate set is empty, which serves exactly that
    val rarest: Seq[(Long, String)] = pRows.map { case (q, ts) =>
      q -> ts.minBy(t => (dfByTerm.getOrElse(t, 0L), t))
    }
    val cand = posts.join(broadcast(rarest.toDF("query_id", "term")),
        Seq("term"))
      .select("query_id", "doc_id").distinct()
    val shifted = posts.join(broadcast(qDf), Seq("term"))
      .join(cand, Seq("query_id", "doc_id"), "left_semi")
      .select(col("query_id"), col("doc_id"), col("plen"), col("off"),
        transform(col("positions"), p => p - col("off")).as("starts"))
    val folded = shifted.groupBy("query_id", "doc_id", "plen")
      .agg(countDistinct(col("off")).as("n_hit"),
        collect_list(col("starts")).as("sets"))
      .filter(col("n_hit") === col("plen"))
      .withColumn("occ",
        aggregate(slice(col("sets"), lit(2), size(col("sets")) - 1),
          element_at(col("sets"), 1),
          (acc, x) => array_intersect(acc, x)))
      .withColumn("n_occ", size(col("occ")).cast("long"))
      .filter(col("n_occ") > 0)
    val scoped =
      if (excludeSelf) folded.filter(col("doc_id") =!= col("query_id"))
      else folded
    rankTopK(scoped, k, col("n_occ").cast("decimal(38,18)"), col("n_occ"))
      .select(col("query_id"), col("doc_id"),
        col("payload").as("n_occ"), col("rank"))
  }

  /** Drive a BM25 serving index from a [[graft.sources.VersionedTable]]'s
    * commit history — the CDC → index sync (q109) with NO change feed
    * maintained at write time: each committed version's net row changes
    * are derived from the MANIFEST DIFF
    * ([[graft.sources.VersionedTable.changesBetween]], bucket-pruned by
    * file-list identity), pre-images struck via
    * [[deleteFromBm25IndexBatch]] and post-images appended via
    * [[appendBm25IndexBatch]] — version ids are the batch ids, so the
    * exactly-once markers make re-runs (and crash redeliveries inside
    * any version) fast-path convergently, and the synced index serves
    * exactly what a fresh build over the latest version would.
    *
    * Version 0 (or the oldest retained version on first sync) replays
    * as pure inserts of its full state — and that full replay is legal
    * ONLY onto a VIRGIN index: if vacuum has dropped manifests past
    * versions this index already synced, the new oldest retained
    * version would re-insert every live doc as a duplicate (doubled
    * postings and dfs, silently). So when the head version is unmarked
    * but the index carries ANY prior sync state (a batch/del marker, a
    * folded frontier, or the stats file), the sync REFUSES loudly
    * instead of replaying (r11 advisor). Versions already marked are
    * skipped without reading any manifest diff. Retention contract:
    * every UNSYNCED version and its predecessor must still be retained
    * (vacuum keeps `retainLast`; sync before vacuuming past unsynced
    * history).
    */
  def syncBm25IndexFromVersionedTable(spark: org.apache.spark.sql.SparkSession,
      tableRoot: String, writer: graft.sources.TableWriter, name: String,
      buckets: Int = 64, vocabBuckets: Int = 16,
      keyCol: String = "doc_id", textCol: String = "text",
      writerId: String = "default"): Unit = {
    import graft.sources.VersionedTable
    val conf = spark.sessionState.newHadoopConf()
    val commitsDir = new org.apache.hadoop.fs.Path(
      writer.path(s"${name}_commits"))
    val fs = commitsDir.getFileSystem(conf)
    val vs = VersionedTable.versions(spark, tableRoot)
    for (v <- vs) {
      val applied =
        IndexProtocol.isMarked(fs, commitsDir, s"batch_$v",
          "frontier_batch", v) &&
        IndexProtocol.isMarked(fs, commitsDir, s"del_$v",
          "frontier_del", v)
      if (!applied) {
        val (pre, post) =
          if (v == vs.head) {
            // full-state replay is only legal onto a virgin index: sync
            // state from any OTHER version id means vacuum dropped
            // manifests past already-synced versions, and replaying the
            // head as pure inserts would double every live doc's
            // postings and dfs. State attributable to v ITSELF (del_v
            // marker, staged_v manifest, write-ahead litter for v, or
            // the stats file while v's legs are in flight) is legitimate
            // crash-redelivery of this very replay and must NOT refuse —
            // the exactly-once legs converge it.
            val st = IndexProtocol.commitsState(fs, commitsDir)
            val inflightForV = st.stagedAppends.contains(v) ||
              st.writeAheadDeletes.contains(v) || st.delMarkers.contains(v)
            val priorSync =
              (st.committedAppends ++ st.delMarkers ++ st.stagedAppends ++
                st.writeAheadDeletes).exists(_ != v) ||
              st.frontierBatch > Long.MinValue ||
              st.frontierDel > Long.MinValue ||
              (!inflightForV && fs.exists(new org.apache.hadoop.fs.Path(
                writer.path(s"${name}_stats"))))
            require(!priorSync,
              s"syncBm25IndexFromVersionedTable: oldest retained version " +
                s"$v of $tableRoot is unsynced but index '$name' already " +
                "carries sync state — vacuum dropped manifests past synced " +
                "history; full replay would duplicate postings. Rebuild " +
                "the index or restore retention before syncing.")
            val full = VersionedTable.read(spark, tableRoot, Some(v))
              .select(col(keyCol), col(textCol))
            (full.limit(0), full)
          } else {
            val d = VersionedTable.changesBetween(spark, tableRoot,
              keyCol, v - 1, v)
            (d.filter(col("change_op").isin("delete", "update_pre"))
              .select(col(keyCol), col(textCol)),
              d.filter(col("change_op").isin("insert", "update_post"))
                .select(col(keyCol), col(textCol)))
          }
        deleteFromBm25IndexBatch(pre, writer, name, batchId = v,
          buckets = buckets, vocabBuckets = vocabBuckets,
          idCol = keyCol, textCol = textCol, writerId = writerId)
        appendBm25IndexBatch(post, writer, name, batchId = v,
          buckets = buckets, vocabBuckets = vocabBuckets,
          idCol = keyCol, textCol = textCol, writerId = writerId)
      }
    }
  }

  /** The STREAMING variant of [[syncBm25IndexFromVersionedTable]]
    * (closing the r11 loop "the index sync replays changesBetween in a
    * batch loop"): a `readStream` over the table's commit history
    * ([[graft.streaming.VtCdfStream]] — offsets ARE version ids) drives
    * the same exactly-once legs through `foreachBatch`. A micro-batch
    * may span several versions (backlog catch-up); rows carry
    * `_commit_version`, so the batch is applied PER VERSION ascending —
    * the strike-before-append discipline holds within and across
    * versions, and version ids double as the protocol batch ids, so a
    * crash anywhere (including a redelivered micro-batch after a
    * checkpoint rollback) fast-paths convergently off the markers, and
    * the streamed index serves bit-identically to a batch rebuild. The
    * stream's own retention rule applies: vacuum must keep every
    * unstreamed version (the source refuses loudly otherwise).
    *
    * `processAll = true` drains the currently-committed history and
    * stops (the finite-source oracle shape); a deployment passes
    * `false` and owns the returned query's lifecycle.
    */
  def syncBm25IndexFromVtStream(spark: org.apache.spark.sql.SparkSession,
      tableRoot: String, writer: graft.sources.TableWriter, name: String,
      checkpoint: String, buckets: Int = 64, vocabBuckets: Int = 16,
      keyCol: String = "doc_id", textCol: String = "text",
      writerId: String = "default", processAll: Boolean = true)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = spark.readStream
      .format(graft.streaming.VtCdfStream.format)
      .option("root", tableRoot).option("key", keyCol).load()
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val batch = df.persist()
        try {
          // bounded collect: one id per version in the micro-batch
          val versions = batch.select("_commit_version").distinct()
            .collect().map(_.getLong(0)).sorted
          for (v <- versions) {
            val b = batch.filter(col("_commit_version") === v)
            deleteFromBm25IndexBatch(
              b.filter(col("change_op").isin("delete", "update_pre"))
                .select(col(keyCol), col(textCol)),
              writer, name, batchId = v, buckets = buckets,
              vocabBuckets = vocabBuckets, idCol = keyCol,
              textCol = textCol, writerId = writerId)
            appendBm25IndexBatch(
              b.filter(col("change_op").isin("insert", "update_post"))
                .select(col(keyCol), col(textCol)),
              writer, name, batchId = v, buckets = buckets,
              vocabBuckets = vocabBuckets, idCol = keyCol,
              textCol = textCol, writerId = writerId)
          }
        } finally batch.unpersist()
        ()
      }.start()
    if (processAll) {
      try q.processAllAvailable() finally q.stop()
    }
    q
  }

  /** Exact top-k tokens per group by frequency (count desc, token asc).
    * The corpus-sized work is the single (group, token) count shuffle
    * with map-side combine; the window that ranks it runs on the
    * aggregated frame, whose size is vocabulary-bounded (Zipf: far
    * smaller than the corpus) — same post-agg-window justification as
    * the rollup entries. Output: (<groupCol>, token, cnt, rank).
    */
  def topTokensPerGroup(docs: DataFrame, groupCol: String, k: Int,
      textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(col(groupCol), explode(split(col(textCol), " ")).as("token"))
      .groupBy(col(groupCol), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("cnt").desc, col("token").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
