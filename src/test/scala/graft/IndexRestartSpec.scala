package graft

import graft.operators.Retrieval
import graft.sources.TableWriter
import org.apache.spark.sql.functions._

/** Exactly-once batch appends into the BM25 serving index
  * ([[Retrieval.appendBm25IndexBatch]] — q89/q106's foreachBatch body):
  * redelivered batches are byte-level no-ops, and every crash point in
  * the write-ahead protocol (partial postings files, dirty vocab merge)
  * recovers to the same index a clean run produces.
  */
class IndexRestartSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def batch(c: Int) = docs.filter(pmod(col("doc_id"), lit(4)) === c)

  private def buildClean(dir: String): TableWriter = {
    val w = new TableWriter(dir)
    (0 to 3).foreach(c => Retrieval.appendBm25IndexBatch(batch(c), w, "docs", c))
    w
  }

  private def indexState(w: TableWriter): (Set[Seq[Any]], Set[Seq[Any]], Seq[Any]) = (
    w.read(spark, "docs_postings")
      .select("doc_id", "dl", "term", "tf").collect().map(_.toSeq).toSet,
    w.read(spark, "docs_vocab").select("term", "df")
      .collect().map(_.toSeq).toSet,
    w.read(spark, "docs_stats").collect()(0).toSeq)

  test("first batch bootstraps; batches accumulate to the full build") {
    val dir = java.nio.file.Files.createTempDirectory("idxr1").toString
    val w = buildClean(dir)
    val refDir = java.nio.file.Files.createTempDirectory("idxr1r").toString
    val wr = new TableWriter(refDir)
    Retrieval.buildBm25Index(docs, wr, "docs")
    val (p, v, st) = indexState(w)
    val (pr, vr, str) = indexState(wr)
    assert(p == pr); assert(v == vr); assert(st == str)
  }

  test("redelivered batch is a byte-level no-op") {
    val dir = java.nio.file.Files.createTempDirectory("idxr2").toString
    val w = buildClean(dir)
    val sigs = parquetFileSigs(dir)
    (0 to 3).foreach(c => Retrieval.appendBm25IndexBatch(batch(c), w, "docs", c))
    assert(parquetFileSigs(dir) == sigs,
      "redelivery of committed batches must touch nothing")
  }

  test("crash after partial postings move recovers to the clean index") {
    val dir = java.nio.file.Files.createTempDirectory("idxr3").toString
    val w = new TableWriter(dir)
    (0 to 2).foreach(c => Retrieval.appendBm25IndexBatch(batch(c), w, "docs", c))
    // simulate a batch-3 attempt that died mid-move: a stray b3- file
    // with garbage content sits in a bucket dir, no commit marker
    val bucketDir = new java.io.File(s"$dir/docs_postings").listFiles
      .filter(_.isDirectory).head
    batch(0).limit(2).select(col("doc_id"), lit(99).as("dl"),
        lit("junk").as("term"), lit(1L).as("tf"))
      .coalesce(1).write.parquet(s"$dir/__junk")
    val junk = new java.io.File(s"$dir/__junk").listFiles
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(junk.toPath,
      new java.io.File(bucketDir, "b3-0.parquet").toPath)
    // redelivery of batch 3 must sweep the stray file and converge
    Retrieval.appendBm25IndexBatch(batch(3), w, "docs", 3)
    val cleanDir = java.nio.file.Files.createTempDirectory("idxr3r").toString
    val (p, v, st) = indexState(w)
    val (pr, vr, str) = indexState(buildClean(cleanDir))
    assert(p == pr); assert(v == vr); assert(st == str)
  }

  test("crash inside the vocab merge (dirty flag) rebuilds exactly") {
    val dir = java.nio.file.Files.createTempDirectory("idxr4").toString
    val w = new TableWriter(dir)
    (0 to 2).foreach(c => Retrieval.appendBm25IndexBatch(batch(c), w, "docs", c))
    // simulate dying mid-merge: dirty flag set, vocab half-destroyed,
    // stats overwritten with garbage
    new java.io.File(s"$dir/docs_vocab_dirty").createNewFile()
    val vb = new java.io.File(s"$dir/docs_vocab").listFiles
      .filter(_.getName.startsWith("vocab_bucket="))
    vb.take(vb.length / 2).foreach { d =>
      d.listFiles.foreach(_.delete()); d.delete()
    }
    Seq((999L, 999L)).toDF("n_docs", "sum_dl")
      .write.mode("overwrite").parquet(s"$dir/docs_stats")
    // the next batch's append sees the dirty flag and rebuilds
    Retrieval.appendBm25IndexBatch(batch(3), w, "docs", 3)
    val cleanDir = java.nio.file.Files.createTempDirectory("idxr4r").toString
    val (p, v, st) = indexState(w)
    val (pr, vr, str) = indexState(buildClean(cleanDir))
    assert(p == pr); assert(v == vr); assert(st == str)
    assert(!new java.io.File(s"$dir/docs_vocab_dirty").exists,
      "recovery must clear the dirty flag")
  }

  test("positional batch appends: redelivery no-op, stray-file redo converges") {
    val dir = java.nio.file.Files.createTempDirectory("idxr6").toString
    val w = new TableWriter(dir)
    (0 to 3).foreach(c =>
      Retrieval.appendPositionalIndexBatch(batch(c), w, "docs", c))
    val sigs = parquetFileSigs(dir)
    // redelivery: byte-level no-op
    (0 to 3).foreach(c =>
      Retrieval.appendPositionalIndexBatch(batch(c), w, "docs", c))
    assert(parquetFileSigs(dir) == sigs)
    // crashed attempt of a NEW batch left a stray file; redo sweeps it
    val bucketDir = new java.io.File(s"$dir/docs_positions").listFiles
      .filter(_.isDirectory).head
    java.nio.file.Files.write(
      new java.io.File(bucketDir, "b9-0.parquet").toPath,
      Array[Byte](1, 2, 3))
    Retrieval.appendPositionalIndexBatch(
      batch(0).withColumn("doc_id", col("doc_id") + 1000000L), w, "docs", 9)
    // one-shot rebuild over the same corpus serves identically
    val refDir = java.nio.file.Files.createTempDirectory("idxr6r").toString
    val wr = new TableWriter(refDir)
    Retrieval.buildPositionalIndex(
      docs.unionByName(batch(0).withColumn("doc_id", col("doc_id") + 1000000L)),
      wr, "docs")
    val phrases = docs.filter(col("doc_id") % 11 === 0
        && size(split(col("text"), " ")) >= 3)
      .select(col("doc_id").as("query_id"),
        slice(split(col("text"), " "), 1, 3).as("terms"))
    def rows(wx: TableWriter) = Retrieval.phraseQuery(spark, wx, "docs",
        phrases, k = 7, excludeSelf = true)
      .collect().map(_.toSeq).toSet
    val got = rows(w)
    assert(got == rows(wr))
    assert(got.nonEmpty)
  }

  test("IVF batch appends: bootstrap on batch 0, redelivery no-op, == one-shot") {
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def ebatch(c: Int) = emb.filter(pmod(col("vec_id"), lit(4)) === c)
    val dir = java.nio.file.Files.createTempDirectory("idxr7").toString
    val w = new TableWriter(dir)
    (0 to 3).foreach(c =>
      Similarity.appendIvfIndexBatch(ebatch(c), w, "emb", c, trainIters = 2))
    val sigs = parquetFileSigs(dir)
    (0 to 3).foreach(c =>
      Similarity.appendIvfIndexBatch(ebatch(c), w, "emb", c, trainIters = 2))
    assert(parquetFileSigs(dir) == sigs,
      "redelivered IVF batches must touch nothing")
    // one-shot build under the SAME quantizer (trained on chunk 0)
    val refDir = java.nio.file.Files.createTempDirectory("idxr7r").toString
    val wr = new TableWriter(refDir)
    val cents = Similarity.trainIvfCentroids(ebatch(0), 97L, 2)
    Similarity.buildIvfIndex(emb, cents, wr, "emb")
    def rows(wx: TableWriter) = Similarity.queryIvfIndex(spark, wx, "emb",
        emb.filter(col("vec_id") < 6), k = 4, nprobe = 2)
      .collect().map(_.toSeq).toSet
    val got = rows(w)
    assert(got == rows(wr))
    assert(got.nonEmpty)
  }

  test("served rankings from the batch build match the one-shot path") {
    val dir = java.nio.file.Files.createTempDirectory("idxr5").toString
    val w = buildClean(dir)
    val qs = Retrieval.queryTerms(docs, col("doc_id") % 11 === 0, 6)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val got = rows(Retrieval.queryBm25Index(spark, w, "docs", qs,
      k = 7, excludeSelf = true))
    val want = rows(Retrieval.bm25TopK(docs, qs, k = 7, excludeSelf = true))
    assert(got == want)
    assert(got.nonEmpty)
  }
}
