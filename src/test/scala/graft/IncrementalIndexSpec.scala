package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** The two round-8 dedup extensions: SemDeDup (within-cluster cosine) and
  * the persisted incremental MinHash band index. Both are approximate
  * SHAPES whose semantics the d36/d37 oracles hash-check end to end; these
  * specs pin the parts an oracle can't — the keep rule on a hand-built
  * geometry, candidate recall vs the exact pair set, and index-append
  * equivalence with a full rebuild.
  */
class IncrementalIndexSpec extends SparkSpec {
  import spark.implicits._

  test("semDedup: keep rule on a hand-built geometry") {
    // two well-separated clusters on the axes; ids chosen so the
    // lowest-id-exemplar rule is observable
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)),          // cluster 0 exemplar
      (2L, Seq(0.9999f, 0.0051f)),    // ~cos 0.99998 to id 1 -> dropped
      (3L, Seq(0.9f, 0.5f)),          // cos ~0.87 to id 1 -> kept
      (4L, Seq(0.0f, 1.0f)),          // cluster 1 exemplar, kept
      (5L, Seq(0.002f, 0.97f)))       // ~cos 1.0 to id 4 -> dropped
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
    val got = Similarity.semDedup(vecs, cents, minCosine = 0.99)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 0L, true), (2L, 0L, false), (3L, 0L, true),
      (4L, 1L, true), (5L, 1L, false)))
  }

  test("semDedupIvf == semDedup, frame for frame (assignment pruning is exact)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.trainIvfCentroids(e, initStride = 13L, iters = 2)
    assert(cents.size >= 4) // enough fine centroids for >1 coarse cell
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Boolean)].collect().toSet
    val exact = rows(Similarity.semDedup(e, cents, minCosine = 0.45))
    val pruned = rows(Similarity.semDedupIvf(e, cents, minCosine = 0.45))
    assert(pruned == exact)
    assert(exact.nonEmpty)

    // adversarial geometry: many near-identical centroids (ties and
    // near-ties are where a wrong bound would flip an argmax)
    val rnd = new scala.util.Random(7)
    val tightCents = (0L until 24L).map { i =>
      val base = Seq(1.0, 0.5, -0.25, 0.125)
      (i, base.map(_ + rnd.nextGaussian() * 1e-3))
    }
    val vecs = (0L until 400L).map { i =>
      (i, Seq.fill(4)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val e2 = rows(Similarity.semDedup(vecs, tightCents, minCosine = 0.9))
    val p2 = rows(Similarity.semDedupIvf(vecs, tightCents, minCosine = 0.9))
    assert(p2 == e2)
  }

  test("coarseCentroidGroups: members lie within their cell radius") {
    val rnd = new scala.util.Random(3)
    val cents = (0L until 30L).map(i =>
      (i, Seq.fill(6)(rnd.nextGaussian())))
    val (cells, groupOf) = Similarity.coarseCentroidGroups(cents, 6)
    assert(cells.nonEmpty && cells.size <= 6)
    def unit(v: Seq[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val byId = cells.map(c => c._1 -> c).toMap
    cents.foreach { case (id, v) =>
      val (_, mean, radius) = byId(groupOf(id))
      val d = math.sqrt(unit(v).zip(mean).map { case (a, b) =>
        (a - b) * (a - b) }.sum)
      assert(d <= radius + 1e-12, s"centroid $id outside its cell radius")
    }
    // every fine centroid got a (remapped, existing) group
    assert(groupOf.keySet == cents.map(_._1).toSet)
    assert(groupOf.values.toSet.subsetOf(cells.map(_._1).toSet))
  }

  test("semDedup: dropped set equals brute-force within-cluster check on real embeddings") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = Similarity.trainIvfCentroids(e, initStride = 97L, iters = 3)
    val got = Similarity.semDedup(e, cents, minCosine = 0.45)
    // independent ground truth: assign by the same argmax, then a plain
    // crossJoin-per-cluster with the HOF cosine (different dot kernel)
    val cdf = broadcast(cents.toDF("cent_id", "cv"))
    val asg = e.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(cdf)
      .withColumn("cs", graft.functions.VectorFns.dotHof(col("v"), col("cv")) /
        (sqrt(graft.functions.VectorFns.dotHof(col("v"), col("v"))) *
         sqrt(graft.functions.VectorFns.dotHof(col("cv"), col("cv")))))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("cs").desc, col("cent_id").asc)))
      .filter(col("rn") === 1).select(col("vec_id"), col("v"), col("cent_id"))
    val a = asg.select(col("cent_id"), col("vec_id").as("ia"), col("v").as("va"))
    val b = asg.select(col("cent_id"), col("vec_id").as("ib"), col("v").as("vb"))
    val truthDropped = a.join(b, Seq("cent_id")).filter(col("ia") < col("ib"))
      .withColumn("cos", graft.functions.VectorFns.dotHof(col("va"), col("vb")) /
        (sqrt(graft.functions.VectorFns.dotHof(col("va"), col("va"))) *
         sqrt(graft.functions.VectorFns.dotHof(col("vb"), col("vb")))))
      .filter(col("cos") >= 0.45)
      .select(col("ib")).distinct().as[Long].collect().toSet
    val gotDropped = got.filter(!col("kept")).select("vec_id").as[Long].collect().toSet
    assert(gotDropped == truthDropped)
    assert(got.count() == e.count()) // every input row classified
  }

  test("incremental LSH candidates cover every exact new-vs-old pair (recall)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val old = d.filter(col("doc_id") % 10 =!= 0)
    val neu = d.filter(col("doc_id") % 10 === 0)
    val index = Dedup.minhashBandRows(
      Dedup.minhashSignatures(old, "doc_id", "text", n = 3, numHashes = 64),
      numHashes = 64, bands = 32)
    val newBands = Dedup.minhashBandRows(
      Dedup.minhashSignatures(neu, "doc_id", "text", n = 3, numHashes = 64),
      numHashes = 64, bands = 32)
    val cands = Dedup.incrementalLshCandidates(index, newBands)
      .as[(Long, Long)].collect().toSet
    // ground truth: every (old, new) pair verified exactly, no pruning
    val all = old.select(col("doc_id").as("id_a"))
      .crossJoin(neu.select(col("doc_id").as("id_b")))
    val truth = Dedup.verifyPairsExact(d, all, "doc_id", "text",
        n = 3, threshold = 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture must contain new-vs-old near-dups")
    assert(truth.subsetOf(cands))
  }

  test("incremental candidate plan broadcasts the new batch — the index is never exchanged") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val index = Dedup.minhashBandRows(
      Dedup.minhashSignatures(d.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", n = 3, numHashes = 64),
      numHashes = 64, bands = 32)
    val newBands = Dedup.minhashBandRows(
      Dedup.minhashSignatures(d.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", n = 3, numHashes = 64),
      numHashes = 64, bands = 32)
    val cands = Dedup.incrementalLshCandidates(index, newBands)
    val physical = cands.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), physical.take(2000))
    // the only exchange below the join's stream side would be a shuffle of
    // the index; assert the join's build side is the broadcast, i.e. no
    // SortMergeJoin / ShuffledHashJoin anywhere in this plan
    assert(!physical.contains("SortMergeJoin") &&
      !physical.contains("ShuffledHashJoin"), physical.take(2000))
  }

  test("bucketed band index: pruned probe == full probe; append leaves existing buckets byte-stable") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def bands(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashBandRows(
        Dedup.minhashSignatures(df, "doc_id", "text", n = 3, numHashes = 64),
        numHashes = 64, bands = 32)
    val dir = java.nio.file.Files.createTempDirectory("lsh_bidx_").toString
    val w = new graft.sources.TableWriter(dir)
    val idxBands = bands(d.filter(col("doc_id") % 10 =!= 0))
    Dedup.buildLshBandIndex(idxBands, w, "lsh_bands", buckets = 16)
    val nb = bands(d.filter(col("doc_id") % 10 === 0))
    val pruned = Dedup.incrementalLshCandidatesIndexed(
        spark, w, "lsh_bands", nb, buckets = 16)
      .as[(Long, Long)].collect().toSet
    val full = Dedup.incrementalLshCandidates(idxBands, nb)
      .as[(Long, Long)].collect().toSet
    assert(pruned == full)
    assert(pruned.nonEmpty)
    // crawl append: new bands land in their own buckets, existing files
    // untouched; the merged index answers like a rebuilt one
    val sigs = parquetFileSigs(s"$dir/lsh_bands")
    val nb2 = bands(d.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L))
    Dedup.appendLshBandIndex(nb2, w, "lsh_bands", buckets = 16)
    sigs.foreach { case (p, sig) =>
      assert(parquetFileSigs(s"$dir/lsh_bands").get(p).contains(sig),
        s"append disturbed $p")
    }
    val merged = w.read(spark, "lsh_bands")
      .select(col("id"), col("band"), col("band_hash"))
      .as[(Long, Int, Long)].collect().toSet
    val rebuilt = idxBands.unionByName(nb2)
      .as[(Long, Int, Long)].collect().toSet
    assert(merged == rebuilt)
  }

  test("index append equals full rebuild (parquet round-trip)") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def bands(df: org.apache.spark.sql.DataFrame) =
      Dedup.minhashBandRows(
        Dedup.minhashSignatures(df, "doc_id", "text", n = 3, numHashes = 64),
        numHashes = 64, bands = 32)
    val dir = java.nio.file.Files.createTempDirectory("lsh_idx_").toString
    try {
      bands(d.filter(col("doc_id") % 10 =!= 0))
        .write.mode("overwrite").parquet(dir)
      bands(d.filter(col("doc_id") % 10 === 0))
        .write.mode("append").parquet(dir)
      val appended = spark.read.parquet(dir)
        .as[(Long, Int, Long)].collect().toSet
      val rebuilt = bands(d).as[(Long, Int, Long)].collect().toSet
      assert(appended == rebuilt)
    } finally {
      val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
