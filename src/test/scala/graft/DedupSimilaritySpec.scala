package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different content about spark engines"))
    .toDF("doc_id", "text")

  test("exactGroups collapses identical texts to min id") {
    val got = Dedup.exactGroups(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 2L) // keep_id 1 has 2 copies
    assert(got(3L) == 1L && got(4L) == 1L)
  }

  test("ngramJaccardPairs finds exact and near dups with correct jaccard") {
    val pairs = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", n = 3,
        threshold = 0.3, maxDocFreq = 10)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) > 0.3 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("ngramJaccardPairsPrefix: identical to the uncapped direct answer") {
    // 30 docs in three near-dup families plus noise; includes a family
    // glued together ONLY by hyper-common tokens — the case the
    // maxDocFreq-capped d2 form drops and the prefix form must keep
    val common = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = (
      (0 until 8).map(i => (i.toLong, s"$common tail$i")) ++         // common-glue family
      (0 until 8).map(i => (100L + i, s"rare${i % 2} unique $i body text here")) ++
      (0 until 8).map(i => (200L + i, s"totally distinct document number $i about topic $i")) ++
      Seq((300L, "the quick brown fox jumps over the lazy dog"),
        (301L, "the quick brown fox jumps over the lazy dog"))
    ).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), math.round(r.getDouble(3) * 1e9))
    val prefix = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text",
      n = 3, threshold = 0.3).collect().map(key).toSet
    // ground truth: verify EVERY id<id pair exactly (no candidate pruning)
    val ids = docs.select(col("doc_id").as("id_a"))
    val all = ids.crossJoin(docs.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    val truth = Dedup.verifyPairsExact(docs, all, "doc_id", "text",
      n = 3, threshold = 0.3).collect().map(key).toSet
    assert(prefix == truth)
    assert(truth.exists { case (a, b, _, _) => a < 8 && b < 8 }) // family found
  }

  test("adaptiveMaxDocFreq keeps the pair stage alive under corpus replication") {
    // the fixed-cap failure mode from the round-4 scale probe: replicate
    // docs so every shingle's df multiplies — a constant cap of 5 drops
    // every posting list, the df-quantile cap tracks the distribution
    val base = (0 until 40).map(i =>
      (i.toLong, s"alpha beta common text unique$i tail$i word$i here"))
      .toDF("doc_id", "text")
    val replicated = (0 until 8).map(r =>
      base.withColumn("doc_id", col("doc_id") + lit(r * 1000L)))
      .reduce(_ union _)
    val fixedCap = Dedup.ngramJaccardPairs(replicated, "doc_id", "text",
      n = 3, threshold = 0.5, maxDocFreq = 5L).count()
    assert(fixedCap == 0L) // the degenerate case really happens
    val cap = Dedup.adaptiveMaxDocFreq(replicated, "doc_id", "text", n = 3)
    val adaptive = Dedup.ngramJaccardPairs(replicated, "doc_id", "text",
      n = 3, threshold = 0.5, maxDocFreq = cap).count()
    // every doc has 7 identical replicas at J=1.0 → at least those pairs
    assert(adaptive >= 40L * (8L * 7L / 2L))
  }

  test("PPJoin positional filter: fewer candidates on a Zipfian corpus, same output") {
    // Zipf-ish token draw (head tokens hyper-common) — the regime where
    // rare-first prefixes stay long and the positional bound actually
    // bites; on uniform corpora it prunes little (ROUND_LOG r3)
    val rnd = new scala.util.Random(7)
    def zipfTok(): String = {
      val r = rnd.nextDouble()
      s"w${math.min(49, (1.0 / (r + 0.02)).toInt)}"
    }
    val docs = (0 until 120).map { i =>
      ((i.toLong, (Seq.fill(12)(zipfTok()) :+ s"rare${i % 37}").mkString(" ")))
    }.toDF("doc_id", "text")
    val pruned = Dedup.prefixJoinCandidateCount(docs, "doc_id", "text",
      n = 3, threshold = 0.3, positionalFilter = true)
    val unpruned = Dedup.prefixJoinCandidateCount(docs, "doc_id", "text",
      n = 3, threshold = 0.3, positionalFilter = false)
    assert(pruned < unpruned,
      s"positional filter did not prune: $pruned vs $unpruned")
    // pruning is candidates-only: verified output == brute-force truth
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), math.round(r.getDouble(3) * 1e9))
    val all = docs.select(col("doc_id").as("id_a"))
      .crossJoin(docs.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    val truth = Dedup.verifyPairsExact(docs, all, "doc_id", "text",
      n = 3, threshold = 0.3).collect().map(key).toSet
    val got = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text",
      n = 3, threshold = 0.3).collect().map(key).toSet
    assert(got == truth && truth.nonEmpty)
  }

  test("dropBoilerplateLines: strikes frequent lines, preserves order") {
    val docs = Seq(
      (1L, "HEADER\nalpha one\nHEADER\nbody middle\ntail one", "en"),
      (2L, "HEADER\nbody two\ntail two", "en"),
      (3L, "HEADER\nbody three", "de"),
      (4L, "no header here\nbody four", "de"),
      (5L, "HEADER", "de"),            // every line boilerplate
      (6L, "AT THRESHOLD\nbody six", "en"),
      (7L, "AT THRESHOLD\nbody seven", "en"))
      .toDF("doc_id", "text", "lang")
    val out = Dedup.dropBoilerplateLines(docs, "doc_id", "text",
        maxLineDocFreq = 2)
      .as[(Long, String, String)].collect()
      .map { case (id, t, l) => id -> (t, l) }.toMap
    // HEADER appears in 4 docs → struck everywhere, incl. BOTH copies in
    // doc 1; surviving lines keep their original relative order
    assert(out(1L)._1 == "alpha one\nbody middle\ntail one")
    assert(out(2L)._1 == "body two\ntail two")
    assert(out(3L)._1 == "body three")
    assert(out(4L)._1 == "no header here\nbody four")
    // df == maxLineDocFreq is KEPT (the <= boundary)
    assert(out(6L)._1 == "AT THRESHOLD\nbody six")
    assert(out(7L)._1 == "AT THRESHOLD\nbody seven")
    // a fully-boilerplate doc survives as an empty-text row (strike
    // lines, don't drop documents)
    assert(out(5L)._1 == "" && out(5L)._2 == "de")
    // non-text columns ride along
    assert(out(3L)._2 == "de")
  }

  test("decontaminate: n-gram overlap with the benchmark drops the doc") {
    val bench = Seq(
      (900L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      // shares 3 distinct 5-grams with the benchmark → contaminated
      (1L, "alpha beta gamma delta epsilon zeta eta unrelated suffix here"),
      (2L, "completely unrelated text with no overlap at all whatsoever"),
      // only 2 shared 5-grams → stays (below minOverlap = 3)
      (3L, "intro alpha beta gamma delta epsilon zeta trailing words"))
      .toDF("doc_id", "text")
    val bad = Dedup.contaminatedDocs(corpus, bench, "doc_id", "text",
      n = 5, minOverlap = 3).as[(Long, Long)].collect().toMap
    assert(bad == Map(1L -> 3L))
    val clean = Dedup.decontaminate(corpus, bench, "doc_id", "text",
      n = 5, minOverlap = 3).select("doc_id").as[Long].collect().sorted
    assert(clean.toSeq == Seq(2L, 3L))
  }

  test("sq8TopK: 8-bit quantization + rerank recovers the exact top-k") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 6)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nbr_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString)).toSet
    val exact = key(Similarity.bruteForceTopK(e, queries, k = 5))
    val sq8 = key(Similarity.sq8TopK(e, queries, k = 5))
    // recall@5 with a 4x rerank shortlist: near-perfect on real vectors
    val overlap = (exact intersect sq8).size.toDouble / exact.size
    assert(overlap >= 0.9, s"sq8 recall@5 = $overlap")
    // deterministic
    assert(sq8 == key(Similarity.sq8TopK(e, queries, k = 5)))
  }

  test("trained IVF: deterministic k-means, recall vs exact top-k not below stride") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 8)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val exact = key(Similarity.bruteForceTopK(e, queries, k = 5))
    val cents = Similarity.trainIvfCentroids(e, initStride = 97L, iters = 3)
    // training is fully deterministic (decimal means, tie-broken argmax,
    // id-hash sample membership): byte-identical centroids on a re-run —
    // the property the oracle replay depends on
    assert(cents == Similarity.trainIvfCentroids(e, initStride = 97L, iters = 3))
    val trained = key(Similarity.ivfTopKWithCentroids(e, queries, k = 5,
      centroids = cents, nprobe = 2))
    val stride = key(Similarity.ivfTopK(e, queries, k = 5,
      centroidStride = 97L, nprobe = 2))
    val rTrained = (exact intersect trained).size.toDouble / exact.size
    val rStride = (exact intersect stride).size.toDouble / exact.size
    // the DEFAULT (r10: FAISS-style min(N, 32K) id-hash sample) trains
    // on 198 of this corpus's 500 vectors — on a toy frame that can land
    // below the full-data seed, so the recall pin here is sanity, not
    // seed-dominance (measured 0.45 on this corpus/quantizer)
    assert(rTrained >= 0.4, s"trained recall@5 = $rTrained")
    // seed-dominance — Lloyd must not DEGRADE the quantizer it was
    // seeded with — holds for FULL-data training (sampleFactor ≤ 0),
    // where every round only reduces quantization error on the same
    // frame the seed came from
    val centsFull = Similarity.trainIvfCentroids(e, initStride = 97L,
      iters = 3, sampleFactor = 0)
    val trainedFull = key(Similarity.ivfTopKWithCentroids(e, queries, k = 5,
      centroids = centsFull, nprobe = 2))
    val rFull = (exact intersect trainedFull).size.toDouble / exact.size
    assert(rFull >= rStride - 1e-9,
      s"full-data trained recall $rFull < stride recall $rStride")
  }

  test("ivfSq8TopK: composed prune+compress recall vs exact, IVF-recall ceiling") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 8)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
    val exact = key(Similarity.bruteForceTopK(e, queries, k = 5))
    val cents = Similarity.trainIvfCentroids(e, initStride = 97L, iters = 3)
    val ivfOnly = key(Similarity.ivfTopKWithCentroids(e, queries, k = 5,
      centroids = cents, nprobe = 2))
    val composed = key(Similarity.ivfSq8TopK(e, queries, k = 5,
      centroids = cents, nprobe = 2, rerankFactor = 4))
    val rIvf = (exact intersect ivfOnly).size.toDouble / exact.size
    val rComposed = (exact intersect composed).size.toDouble / exact.size
    // quantization inside probed lists costs little on top of IVF pruning:
    // the composed recall stays within one shortlist miss of the IVF-only
    // recall ceiling (and both are deterministic on this corpus)
    assert(rComposed >= rIvf - 0.1,
      s"composed recall $rComposed far below IVF-only $rIvf")
    // floor re-pinned for the r10 sampled quantizer (trains on 198 of
    // 500 toy vectors; measured 0.45 here) — the relative IVF-ceiling
    // guard above is the corruption detector, the floor is sanity
    assert(rComposed >= 0.4, s"composed recall@5 = $rComposed")
    assert(composed == key(Similarity.ivfSq8TopK(e, queries, k = 5,
      centroids = cents, nprobe = 2, rerankFactor = 4)))
  }

  test("persisted IVF index round-trip equals the in-memory form") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 8)
    val cents = Similarity.trainIvfCentroids(e, initStride = 97L, iters = 3)
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfidx_")
    try {
      val writer = new graft.sources.TableWriter(wh.toString)
      Similarity.buildIvfIndex(e, cents, writer, "emb")
      def key(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "nbr_id", "rank").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString)).toSet
      val persisted = key(Similarity.queryIvfIndex(spark, writer, "emb",
        queries, k = 5, nprobe = 2))
      val inMemory = key(Similarity.ivfTopKWithCentroids(e, queries, k = 5,
        centroids = cents, nprobe = 2))
      // bit-identical: parquet round-trips doubles exactly and the query
      // path reuses the same scoring arithmetic and tie-breaks
      assert(persisted == inMemory && persisted.nonEmpty)
    } finally {
      val walk = java.nio.file.Files.walk(wh)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("filtered IVF query: results within the filter, all-pass == unfiltered") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 8)
    val cents = Similarity.trainIvfCentroids(e, initStride = 97L, iters = 3)
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfflt_")
    try {
      val writer = new graft.sources.TableWriter(wh.toString)
      Similarity.buildIvfIndex(e, cents, writer, "emb")
      def key(df: org.apache.spark.sql.DataFrame) =
        df.select("query_id", "nbr_id", "rank").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString)).toSet
      val unfiltered = key(Similarity.queryIvfIndex(spark, writer, "emb",
        queries, k = 5, nprobe = 2))
      // all-pass filter must be a no-op
      val allPass = key(Similarity.queryIvfIndex(spark, writer, "emb",
        queries, k = 5, nprobe = 2,
        allowed = Some(e.select(col("vec_id")))))
      assert(allPass == unfiltered && unfiltered.nonEmpty)
      // even-ids-only: every result id is even, and dropping the odd
      // candidates re-ranks (post-filter semantics — survivors keep
      // their relative cosine order)
      val even = Similarity.queryIvfIndex(spark, writer, "emb",
        queries, k = 5, nprobe = 2,
        allowed = Some(e.filter(col("vec_id") % 2 === 0)
          .select(col("vec_id"))))
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"),
          r.getAs[Int]("rank")))
      assert(even.nonEmpty && even.forall(_._2 % 2 == 0),
        s"odd candidate leaked through the filter: ${even.toList}")
      // the even-filtered ranking == unfiltered ranking with odd rows
      // struck and ranks re-densified
      val expect = Similarity.queryIvfIndex(spark, writer, "emb",
          queries, k = 100000, nprobe = 2).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nbr_id"),
          r.getAs[Int]("rank")))
        .filter(_._2 % 2 == 0)
        .groupBy(_._1).toSeq.flatMap { case (q, rs) =>
          rs.sortBy(_._3).map(_._2).zipWithIndex.take(5)
            .map { case (n, i) => (q, n, i + 1) } }
        .toSet
      assert(even.toSet == expect)
    } finally {
      val walk = java.nio.file.Files.walk(wh)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("persisted IVF query scan carries PartitionFilters on cent_id, uncast") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.trainIvfCentroids(e, initStride = 97L, iters = 3)
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfpf_")
    try {
      val writer = new graft.sources.TableWriter(wh.toString)
      Similarity.buildIvfIndex(e, cents, writer, "emb")
      val df = Similarity.queryIvfIndex(spark, writer, "emb",
        e.filter(col("vec_id") < 2), k = 5, nprobe = 2)
      // pre-AQE physical plan: FileSourceScanExec nodes are reachable and
      // partitionFilters are already resolved at this point
      val scans = df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val listScans = scans.filter(
        _.relation.location.rootPaths.mkString(",").contains("emb_lists"))
      assert(listScans.nonEmpty, s"no scan over emb_lists found among " +
        scans.map(_.relation.location.rootPaths.mkString).mkString("; "))
      val pf = listScans.flatMap(_.partitionFilters)
      assert(pf.nonEmpty, "lists scan lost its PartitionFilters — the probe " +
        "isin no longer prunes partitions")
      val pfStr = pf.mkString(" && ")
      assert(pfStr.contains("cent_id"), pfStr)
      // a cast AROUND the partition column defeats pruning silently
      assert(!pfStr.toLowerCase.matches(""".*cast\(cent_id[^)]*\).*"""),
        s"pruning-defeating cast on cent_id: $pfStr")
      // and the filter actually selects fewer list directories than exist
      // (static filters only: the dynamic-pruning subquery is unevaluable
      // outside execution, and the static IN must prune on its own)
      val scan = listScans.head
      val staticFilters = scan.partitionFilters
        .filterNot(_.toString.contains("dynamicpruning"))
      assert(staticFilters.exists(_.toString.contains(" IN ")),
        s"static IN pruning filter missing: ${scan.partitionFilters.mkString(" && ")}")
      val selected = scan.relation.location
        .listFiles(staticFilters, scan.dataFilters).length
      val total = scan.relation.location.listFiles(Nil, Nil).length
      assert(selected < total,
        s"pruning selected $selected of $total list partitions — nothing pruned")
    } finally {
      val walk = java.nio.file.Files.walk(wh)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("persisted IVF+PQ index: codes not vectors on disk, pruned+uncast scan, deterministic") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = e.filter(col("vec_id") < 8)
    val cents = Similarity.trainIvfCentroids(e, initStride = 97L, iters = 3)
    val cbs = Similarity.trainPqCodebooks(e, m = 4, subDim = 16,
      initStride = 13L, ksub = 16, iters = 2)
    val wh = java.nio.file.Files.createTempDirectory("graft_ivfpq_")
    try {
      val writer = new graft.sources.TableWriter(wh.toString)
      Similarity.buildIvfPqIndex(e, cents, cbs, m = 4, subDim = 16, writer, "emb")
      // the compression claim is structural: the lists table holds m CODES
      // and a precomputed norm, never the raw doubles
      // (cent_id is the directory-inferred partition column, not file data)
      val listSchema = spark.read.parquet(writer.path("emb_lists")).schema
      assert(listSchema.fieldNames.toSet ==
        Set("nbr_id", "codes", "approx_norm", "cent_id"), listSchema.treeString)
      assert(listSchema("codes").dataType.simpleString.startsWith("array<bigint>"),
        listSchema("codes").dataType.simpleString)
      val df = Similarity.queryIvfPqIndex(spark, writer, "emb", e, queries,
        k = 5, nprobe = 2, rerankFactor = 8)
      // partition pruning survives, cast-free (the queryIvfIndex rule)
      val scans = df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      val listScans = scans.filter(
        _.relation.location.rootPaths.mkString(",").contains("emb_lists"))
      assert(listScans.nonEmpty)
      val pfStr = listScans.flatMap(_.partitionFilters).mkString(" && ")
      assert(pfStr.contains("cent_id"), pfStr)
      assert(!pfStr.toLowerCase.matches(""".*cast\(cent_id[^)]*\).*"""),
        s"pruning-defeating cast on cent_id: $pfStr")
      def key(d: org.apache.spark.sql.DataFrame) =
        d.select("query_id", "nbr_id", "rank").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString)).toSet
      val got = key(df)
      // deterministic across runs, and quantized recall stays sane vs exact
      assert(got == key(Similarity.queryIvfPqIndex(spark, writer, "emb", e,
        queries, k = 5, nprobe = 2, rerankFactor = 8)))
      val exact = Similarity.bruteForceTopK(e, queries, k = 5)
        .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
      val ivfOnly = Similarity.ivfTopKWithCentroids(e, queries, k = 5,
          centroids = cents, nprobe = 2)
        .select("query_id", "nbr_id").as[(Long, Long)].collect().toSet
      val gotPairs = got.map(t => (t._1, t._2))
      val recall = (exact intersect gotPairs).size.toDouble / exact.size
      val rIvf = (exact intersect ivfOnly).size.toDouble / exact.size
      // the IVF-only recall is the pruning ceiling; 16-code PQ inside the
      // probed lists may cost a few shortlist misses on this tiny corpus
      // but must stay near it — far below means corrupted codes, not
      // quantization noise
      // absolute floor re-pinned for the r10 sampled quantizer
      // (measured 0.375 on this toy corpus); the relative ceiling
      // guard is what detects corrupted codes
      assert(recall >= rIvf - 0.15 && recall >= 0.3,
        s"IVF+PQ recall@5 = $recall vs IVF-only $rIvf")
    } finally {
      val walk = java.nio.file.Files.walk(wh)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

  test("reliable-checkpoint flag: iterative clustering same answer, no local blocks") {
    // spark.graft.reliableCheckpoint=true switches every lineage
    // truncation from executor-local blocks (lost-executor = dead job on
    // a cluster) to reliable checkpoint() files — same results required
    // smallGraphThreshold=0 forces the distributed pointer-jump path (the
    // default local union-find shortcut never checkpoints at all)
    val edges = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val plain = Dedup.clusters(edges, smallGraphThreshold = 0)
      .as[(Long, Long)].collect().toSet
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    try {
      val reliable = Dedup.clusters(edges, smallGraphThreshold = 0)
        .as[(Long, Long)].collect().toSet
      assert(reliable == plain && plain.nonEmpty)
      assert(spark.sparkContext.getCheckpointDir.nonEmpty,
        "reliable checkpoint ran without a checkpoint dir")
    } finally spark.conf.unset("spark.graft.reliableCheckpoint")
  }

  test("d3 banding (32 bands x 2 rows) proposes every exact pair on the corpus") {
    // recall is ASSERTED at the verified scale, not assumed: at 32x2 a
    // pair at the J=0.35 oracle threshold is proposed with p ~ 0.985 per
    // band-set draw (deterministic hashes — the draw happened once), so
    // this subset check is what actually licenses d3's exact-pair oracle
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val proposed = Dedup.minhashLshPairs(d, "doc_id", "text",
        n = 3, numHashes = 64, bands = 32, minEstJaccard = 0.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairsPrefix(d, "doc_id", "text",
        n = 3, threshold = 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(proposed),
      s"banding missed true pairs: ${(exact -- proposed).take(5)}")
    assert(exact.nonEmpty) // the check bites: the corpus has true pairs
  }

  test("minhashLshPairs surfaces the exact-dup pair with est 1.0") {
    val pairs = Dedup.minhashLshPairs(corpus, "doc_id", "text",
        n = 3, numHashes = 32, bands = 8, minEstJaccard = 0.5)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(pairs((1L, 2L)) == 1.0)
  }

  test("clusters: min-label connected components over pair chains") {
    // chain 1-2, 2-3, 3-4 (one cluster, rep 1); pair 10-11; isolated via 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val got = Dedup.clusters(pairs).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("clusters: 60-node chain, local union-find and distributed paths agree") {
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val local = Dedup.clusters(chain).as[(Long, Long)].collect()
    assert(local.length == 60 && local.forall(_._2 == 1L))
    // force the distributed min-label/pointer-jump path
    val dist = Dedup.clusters(chain, smallGraphThreshold = 0)
      .as[(Long, Long)].collect()
    assert(dist.sorted.sameElements(local.sorted))
  }

  test("clusters at size: 2^17-node chain converges in ~log(diameter) rounds") {
    // worst-case diameter for the propagation loop; pointer-jumping must
    // finish in O(log N) rounds or maxIterations trips and throws
    val n = 1 << 17
    val chain = spark.range(0, n - 1).selectExpr("id AS id_a", "id + 1 AS id_b")
    val out = Dedup.clusters(chain, smallGraphThreshold = 0,
      maxIterations = 17 + 4) // log2(2^17) + slack — far below O(diameter)
    val agg = out.agg(count(lit(1)), countDistinct(col("cluster_id")),
      min(col("cluster_id")), max(col("member_id"))).head()
    assert(agg.getLong(0) == n)      // every member labeled
    assert(agg.getLong(1) == 1L)     // single component
    assert(agg.getLong(2) == 0L)     // canonical = min id
    assert(agg.getLong(3) == n - 1L)
  }

  test("clusters at size: 1M-edge star converges in constant rounds") {
    val m = 1000000L
    val star = spark.range(1, m + 1).selectExpr("CAST(0 AS BIGINT) AS id_a", "id AS id_b")
    val out = Dedup.clusters(star, smallGraphThreshold = 0, maxIterations = 5)
    val agg = out.agg(count(lit(1)), countDistinct(col("cluster_id"))).head()
    assert(agg.getLong(0) == m + 1)
    assert(agg.getLong(1) == 1L)
  }

  test("simhashPairs: identical docs at hamming 0") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, h) => (a, b) -> h }.toMap
    assert(pairs((1L, 2L)) == 0)
  }

  val vecs = Seq(
    (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
    (2L, Seq(0.0f, 1.0f)), (3L, Seq(-1.0f, 0.0f)))
    .toDF("vec_id", "embedding")

  test("bruteForceTopK ranks by cosine with id tie-break") {
    val got = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0L), k = 3)
      .orderBy("rank").select("nbr_id").as[Long].collect()
    assert(got.toSeq == Seq(1L, 2L, 3L))
  }

  test("lshTopK returns a subset consistent with rank contract") {
    val got = Similarity.lshTopK(vecs, vecs.filter(col("vec_id") === 0L), k = 3,
      numPlanes = 2, dim = 2)
    val ranks = got.select("rank").as[Long].collect()
    assert(ranks.sorted.sameElements(1L to ranks.length))
  }

  test("lshTopKMultiProbe at full probe radius equals brute force") {
    val q = vecs.filter(col("vec_id") === 0L)
    val full = Similarity.lshTopKMultiProbe(vecs, q, k = 3,
        numPlanes = 2, dim = 2, probeHamming = 2)
      .orderBy("rank").select("nbr_id").as[Long].collect()
    val exact = Similarity.bruteForceTopK(vecs, q, k = 3)
      .orderBy("rank").select("nbr_id").as[Long].collect()
    assert(full.sameElements(exact))
    // a tighter radius returns a rank-consistent subset
    val sub = Similarity.lshTopKMultiProbe(vecs, q, k = 3,
      numPlanes = 2, dim = 2, probeHamming = 1)
    val ranks = sub.select("rank").as[Long].collect()
    assert(ranks.sorted.sameElements(1L to ranks.length))
  }

  test("simhashPairs widened radius (8x8 chunks) still exact by pigeonhole") {
    val pairs = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 7)
      .as[(Long, Long, Int)].collect()
    assert(pairs.forall(_._3 <= 7))
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
  }

  test("verifyPairsExact computes hand-checked jaccard and filters") {
    val docs = Seq(
      (1L, "a b c d e"),   // shingles: {a b c, b c d, c d e}
      (2L, "a b c d x"),   // shingles: {a b c, b c d, c d x} → J = 2/4 = 0.5
      (3L, "z z z z z"))
      .toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.verifyPairsExact(docs, cands, "doc_id", "text",
      n = 3, threshold = 0.4).as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 2L, 0.5))) // (1,3) filtered: J = 0
  }

  // --------------------------------------------------------- d42 pagerank

  private def pr(pairs: (Long, Long)*): Map[Long, (Long, Long)] =
    Dedup.pageRank(pairs.toDF("id_a", "id_b"), iters = 5, k = 100)
      .collect().map(r => r.getAs[Long]("doc_id")
        -> (r.getAs[Long]("rank"), r.getAs[Long]("degree"))).toMap

  test("pageRank: star center outranks its leaves, degrees exact") {
    // 1 is linked to 2..5; 6-7 are an isolated pair
    val got = pr((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (6L, 7L))
    assert(got(1L)._1 == 1L, s"hub must rank first: $got")
    assert(got(1L)._2 == 4L)
    val leafRanks = Seq(2L, 3L, 4L, 5L).map(got(_)._1)
    // structurally identical leaves tie and break on id: consecutive ranks
    assert(leafRanks.sorted == (leafRanks.min until leafRanks.min + 4).toSeq)
    assert(got(2L)._1 < got(3L)._1 && got(3L)._1 < got(4L)._1
      && got(4L)._1 < got(5L)._1)
  }

  test("pageRank: rank mass is conserved on a symmetric graph") {
    val ranksDf = Dedup.pageRank(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (5L, 6L))
        .toDF("id_a", "id_b"), iters = 5, k = 100)
    assert(ranksDf.count() == 6)
    // no dangling nodes in a symmetric graph → Σr = 1 up to float noise
    // (not recoverable from the rank-only output; recompute inline)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (5L, 6L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = deg.keys.map(_ -> 1.0 / deg.size).toMap
    (1 to 5).foreach { _ =>
      r = deg.keys.map { v =>
        val in = edges.filter(_._2 == v).map(_._1)
        v -> (0.15 / deg.size + 0.85 * in.map(u => r(u) / deg(u)).sum)
      }.toMap
    }
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("pageRank: a member bridging two families outranks in-family dups") {
    // two triangles sharing node 10 — 10 has degree 4, everyone else 2
    val got = pr((10L, 11L), (10L, 12L), (11L, 12L),
      (10L, 21L), (10L, 22L), (21L, 22L))
    assert(got(10L)._1 == 1L && got(10L)._2 == 4L, s"bridge must win: $got")
  }
}
