package graft

import graft.operators.{Retrieval, Similarity}
import graft.sources.TableWriter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-isolated index serving (q112/q113/q114's contract): a reader
  * racing — or landing between a crash and its redelivery of — the
  * exactly-once append protocols sees EXACTLY the last committed batch's
  * state, bit-for-bit; in-flight delete legs (in-place rewrites, no
  * pre-image) refuse loudly; and the quiescent path leaves today's plans
  * untouched. The crashed states are built by the protocol-faithful
  * injectors (postings moved in behind their staged manifest, dirty flag
  * write-ahead, damaged vocab buckets + garbage stats for BM25).
  */
class SnapshotReadSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val embs =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def batch(c: Int) = docs.filter(pmod(col("doc_id"), lit(4)) === c)
  private def ebatch(c: Int) = embs.filter(pmod(col("vec_id"), lit(4)) === c)

  private def qs = Retrieval.queryTerms(docs, col("doc_id") % 97 === 0, 8)

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  // committed 0..2 reference index (no batch 3 at all)
  private lazy val cleanW: TableWriter = {
    val dir = java.nio.file.Files.createTempDirectory("snapc").toString
    val w = new TableWriter(dir)
    (0 to 2).foreach(c => Retrieval.appendBm25IndexBatch(batch(c), w, "docs", c))
    w
  }

  // 0..2 committed + batch 3 crashed mid-vocab-merge
  private lazy val crashedW: TableWriter = {
    val dir = java.nio.file.Files.createTempDirectory("snapx").toString
    val w = new TableWriter(dir)
    (0 to 2).foreach(c => Retrieval.appendBm25IndexBatch(batch(c), w, "docs", c))
    Retrieval.injectCrashedBm25Append(batch(3), w, "docs", 3L)
    w
  }

  test("bm25: serving a crashed mid-merge index equals the committed state") {
    val expect = rows(Retrieval.queryBm25Index(spark, cleanW, "docs", qs,
      k = 10, excludeSelf = true))
    val got = rows(Retrieval.queryBm25Index(spark, crashedW, "docs", qs,
      k = 10, excludeSelf = true))
    assert(got == expect,
      "snapshot read must serve the pre-crash committed index bit-exactly")
    assert(got.nonEmpty, "fixture must retrieve something")
  }

  test("bm25 max-score serves the same committed snapshot") {
    val expect = rows(Retrieval.queryBm25IndexMaxScore(spark, cleanW, "docs",
      qs, k = 10, excludeSelf = true))
    val got = rows(Retrieval.queryBm25IndexMaxScore(spark, crashedW, "docs",
      qs, k = 10, excludeSelf = true))
    assert(got == expect)
  }

  test("bm25: real redelivery of the crashed batch heals and serves 0..3") {
    // fresh crashed index (don't consume the shared fixture)
    val dir = java.nio.file.Files.createTempDirectory("snaph").toString
    val w = new TableWriter(dir)
    (0 to 2).foreach(c => Retrieval.appendBm25IndexBatch(batch(c), w, "docs", c))
    Retrieval.injectCrashedBm25Append(batch(3), w, "docs", 3L)
    Retrieval.appendBm25IndexBatch(batch(3), w, "docs", 3L) // the redelivery
    val refDir = java.nio.file.Files.createTempDirectory("snaphr").toString
    val wr = new TableWriter(refDir)
    (0 to 3).foreach(c => Retrieval.appendBm25IndexBatch(batch(c), wr, "docs", c))
    val expect = rows(Retrieval.queryBm25Index(spark, wr, "docs", qs,
      k = 10, excludeSelf = true))
    val got = rows(Retrieval.queryBm25Index(spark, w, "docs", qs,
      k = 10, excludeSelf = true))
    assert(got == expect, "post-redelivery serving must equal a clean 0..3 build")
  }

  test("bm25: in-flight delete leg refuses loudly") {
    val dir = java.nio.file.Files.createTempDirectory("snapd").toString
    val w = new TableWriter(dir)
    (0 to 2).foreach(c => Retrieval.appendBm25IndexBatch(batch(c), w, "docs", c))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/docs_commits/delstate_9"),
      "1\t1\n".getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      Retrieval.queryBm25Index(spark, w, "docs", qs, k = 10,
        excludeSelf = true).collect()
    }
    assert(e.getMessage.contains("delete leg in flight"))
    // a committed delete (marker present) serves normally again
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/docs_commits/del_9"))
    assert(rows(Retrieval.queryBm25Index(spark, w, "docs", qs, k = 10,
      excludeSelf = true)).nonEmpty)
  }

  test("quiescent plan is untouched: no input_file_name filter, no commits litter cost") {
    val plan = Retrieval.queryBm25Index(spark, cleanW, "docs", qs,
      k = 10, excludeSelf = true).queryExecution.executedPlan.toString
    assert(!plan.contains("input_file_name"),
      "steady-state serving must not pay the uncommitted-file filter")
  }

  test("crashed plan DOES carry the exclusion filter") {
    val plan = Retrieval.queryBm25Index(spark, crashedW, "docs", qs,
      k = 10, excludeSelf = true).queryExecution.executedPlan.toString
    assert(plan.contains("input_file_name"))
  }

  test("bm25: live bootstrap dirty flag (no batch ever committed) serves empty") {
    val dir = java.nio.file.Files.createTempDirectory("snapb").toString
    val w = new TableWriter(dir)
    // protocol-faithful crashed bootstrap: postings + staged manifest +
    // bootstrap dirty flag + vocab/stats materialized, NO marker — the
    // idxr5 fixture shape, seen by a READER this time
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/docs_commits"))
    Retrieval.appendBm25IndexBatch(batch(0), w, "docs", 0L)
    // rewind the commit: delete the marker, re-declare the dirty flag
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/docs_commits/batch_0"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/docs_vocab_dirty"),
      "0\nbootstrap\n".getBytes("UTF-8"))
    val got = Retrieval.queryBm25Index(spark, w, "docs", qs, k = 10,
      excludeSelf = true)
    assert(got.collect().isEmpty,
      "an index with no committed batch serves the empty committed state")
  }

  test("positional: phrase serving under a crashed append equals committed") {
    val phrases = docs
      .filter(col("doc_id") % 97 === 0 && size(split(col("text"), " ")) >= 3)
      .select(col("doc_id").as("query_id"),
        slice(split(col("text"), " "), 1, 3).as("terms"))
    val cdir = java.nio.file.Files.createTempDirectory("snpp").toString
    val cw = new TableWriter(cdir)
    (0 to 2).foreach(c =>
      Retrieval.appendPositionalIndexBatch(batch(c), cw, "docs", c))
    val xdir = java.nio.file.Files.createTempDirectory("snpx").toString
    val xw = new TableWriter(xdir)
    (0 to 2).foreach(c =>
      Retrieval.appendPositionalIndexBatch(batch(c), xw, "docs", c))
    Retrieval.injectCrashedPositionalAppend(batch(3), xw, "docs", 3L)
    val expect = rows(Retrieval.phraseQuery(spark, cw, "docs", phrases,
      k = 10, excludeSelf = true))
    val got = rows(Retrieval.phraseQuery(spark, xw, "docs", phrases,
      k = 10, excludeSelf = true))
    assert(got == expect)
    assert(got.nonEmpty)
    // in-flight positional delete (write-ahead flag) refuses
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$xdir/docs_pos_commits/delflag_9"))
    val e = intercept[IllegalStateException] {
      Retrieval.phraseQuery(spark, xw, "docs", phrases, k = 10,
        excludeSelf = true).collect()
    }
    assert(e.getMessage.contains("delete leg in flight"))
  }

  test("ivf: probing under a crashed append serves committed lists only") {
    val queries = embs.filter(col("vec_id") < 8)
    val cdir = java.nio.file.Files.createTempDirectory("snvi").toString
    val cw = new TableWriter(cdir)
    (0 to 2).foreach(c =>
      Similarity.appendIvfIndexBatch(ebatch(c), cw, "emb", c))
    val xdir = java.nio.file.Files.createTempDirectory("snvx").toString
    val xw = new TableWriter(xdir)
    (0 to 2).foreach(c =>
      Similarity.appendIvfIndexBatch(ebatch(c), xw, "emb", c))
    Similarity.injectCrashedIvfAppend(ebatch(3), xw, "emb", 3L)
    val expect = rows(Similarity.queryIvfIndex(spark, cw, "emb", queries,
      k = 5, nprobe = 2))
    val got = rows(Similarity.queryIvfIndex(spark, xw, "emb", queries,
      k = 5, nprobe = 2))
    assert(got == expect)
    assert(got.nonEmpty)
    // healing: the real redelivery then serves 0..3
    Similarity.appendIvfIndexBatch(ebatch(3), xw, "emb", 3L)
    val rdir = java.nio.file.Files.createTempDirectory("snvr").toString
    val rw = new TableWriter(rdir)
    (0 to 3).foreach(c =>
      Similarity.appendIvfIndexBatch(ebatch(c), rw, "emb", c))
    assert(rows(Similarity.queryIvfIndex(spark, xw, "emb", queries,
        k = 5, nprobe = 2))
      == rows(Similarity.queryIvfIndex(spark, rw, "emb", queries,
        k = 5, nprobe = 2)))
    // in-flight IVF delete leg refuses
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$xdir/emb_ivf_commits/delflag_9"))
    val e = intercept[IllegalStateException] {
      Similarity.queryIvfIndex(spark, xw, "emb", queries, k = 5,
        nprobe = 2).collect()
    }
    assert(e.getMessage.contains("delete leg in flight"))
  }

  test("ivf: unborn streamed index (crashed bootstrap) serves empty") {
    val dir = java.nio.file.Files.createTempDirectory("snvb").toString
    val w = new TableWriter(dir)
    Similarity.appendIvfIndexBatch(ebatch(0), w, "emb", 0L)
    // rewind the bootstrap commit: centroids/lists exist, marker gone —
    // history-based detection must treat the index as unborn for readers
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/emb_ivf_commits/batch_0"))
    val got = Similarity.queryIvfIndex(spark, w, "emb",
      embs.filter(col("vec_id") < 8), k = 5, nprobe = 2)
    assert(got.collect().isEmpty)
  }
}
