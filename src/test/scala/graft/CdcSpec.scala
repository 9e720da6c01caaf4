package graft

import graft.sources.TableWriter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-feed semantics of mergeByKeyCdc/deleteByKeyCdc (q90/q91).
  * The driver oracle hash-checks the feed content on the real flow; this
  * spec pins the PROPERTIES the feed contract rests on: silence of
  * idempotent re-runs, replayability (folding the feed reconstructs the
  * table state exactly), delete images carrying current values, and the
  * feed never touching the merged table's own content.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def freshWriter(): TableWriter =
    new TableWriter(
      java.nio.file.Files.createTempDirectory("cdc").toString)

  private def rows(ks: (Long, Double)*): DataFrame =
    ks.toDF("k", "v")

  private def feed(w: TableWriter): List[(Long, String, Long, Double)] =
    w.readChangeFeed(spark, "t")
      .collect().map(r => (r.getAs[Long]("batch_id"),
        r.getAs[String]("change_op"), r.getAs[Long]("k"),
        r.getAs[Double]("v"))).toList.sorted

  test("cdc: first batch is all inserts; identical re-run is silent") {
    val w = freshWriter()
    val b = rows(1L -> 10.0, 2L -> 20.0)
    w.mergeByKeyCdc(spark, "t", b, "k", batchId = 1L)
    assert(feed(w).toSet ==
      Set((1L, "insert", 1L, 10.0), (1L, "insert", 2L, 20.0)))
    w.mergeByKeyCdc(spark, "t", b, "k", batchId = 2L)
    assert(feed(w).count(_._1 == 2L) == 0,
      s"idempotent re-run must emit nothing: ${feed(w)}")
  }

  test("cdc: changed rows emit pre+post images, unchanged rows nothing") {
    val w = freshWriter()
    w.mergeByKeyCdc(spark, "t", rows(1L -> 10.0, 2L -> 20.0, 3L -> 30.0),
      "k", batchId = 1L)
    // 1 changes, 2 is resent unchanged, 4 is new
    w.mergeByKeyCdc(spark, "t", rows(1L -> 11.0, 2L -> 20.0, 4L -> 40.0),
      "k", batchId = 2L)
    val b2 = feed(w).filter(_._1 == 2L).toSet
    assert(b2 == Set(
      (2L, "update_pre", 1L, 10.0), (2L, "update_post", 1L, 11.0),
      (2L, "insert", 4L, 40.0)), s"got $b2")
  }

  test("cdc: delete images carry CURRENT values; absent keys are silent") {
    val w = freshWriter()
    w.mergeByKeyCdc(spark, "t", rows(1L -> 10.0, 2L -> 20.0), "k", 1L)
    w.mergeByKeyCdc(spark, "t", rows(1L -> 11.0), "k", 2L)
    w.deleteByKeyCdc(spark, "t", Seq(1L, 99L).toDF("k"), "k", batchId = 3L)
    val b3 = feed(w).filter(_._1 == 3L).toSet
    // the delete image is the post-update value, 99 emits nothing
    assert(b3 == Set((3L, "delete", 1L, 11.0)), s"got $b3")
    // re-running the delete is silent too
    w.deleteByKeyCdc(spark, "t", Seq(1L).toDF("k"), "k", batchId = 4L)
    assert(feed(w).count(_._1 == 4L) == 0)
  }

  test("cdc: folding the feed reconstructs the table state exactly") {
    val w = freshWriter()
    w.mergeByKeyCdc(spark, "t", rows(1L -> 10.0, 2L -> 20.0, 3L -> 30.0),
      "k", 1L)
    w.mergeByKeyCdc(spark, "t", rows(2L -> 21.0, 4L -> 40.0), "k", 2L)
    w.deleteByKeyCdc(spark, "t", Seq(3L).toDF("k"), "k", 3L)
    // replay: apply ops in batch order into a map
    val state = scala.collection.mutable.Map.empty[Long, Double]
    feed(w).foreach {
      case (_, "insert", k, v)      => state(k) = v
      case (_, "update_post", k, v) => state(k) = v
      case (_, "update_pre", _, _)  => ()
      case (_, "delete", k, _)      => state.remove(k)
      case other => fail(s"unknown op $other")
    }
    val table = w.read(spark, "t").select("k", "v")
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Double]("v")).toMap
    assert(state.toMap == table,
      s"feed replay diverged: replay=$state table=$table")
    assert(table == Map(1L -> 10.0, 2L -> 21.0, 4L -> 40.0))
  }

  test("cdc: merged table content is identical to a plain mergeByKey") {
    val wCdc = freshWriter()
    val wPlain = freshWriter()
    val b1 = rows(1L -> 10.0, 2L -> 20.0)
    val b2 = rows(2L -> 21.0, 3L -> 30.0)
    wCdc.mergeByKeyCdc(spark, "t", b1, "k", 1L)
    wCdc.mergeByKeyCdc(spark, "t", b2, "k", 2L)
    wPlain.mergeByKey(spark, "t", b1, "k")
    wPlain.mergeByKey(spark, "t", b2, "k")
    def dump(w: TableWriter) = w.read(spark, "t").select("k", "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(dump(wCdc) == dump(wPlain))
  }

  test("cdc: feed batches land in their own dirs; a big batch gets several files") {
    // the r9 verdict's Missing #3: a bulk backfill's feed must not
    // funnel through one coalesce(1) task — file count is size-estimated
    // per batch, and each batch is its own batch=<id> directory so
    // consumers still see batches
    val w = freshWriter()
    val big = spark.range(1000)
      .select(col("id").as("k"), (col("id") * 2).cast("double").as("v"))
    w.mergeByKeyCdc(spark, "t", big, "k", 1L, feedMaxRowsPerFile = 100L)
    w.mergeByKeyCdc(spark, "t", rows(1L -> 99.0), "k", 2L,
      feedMaxRowsPerFile = 100L)
    val root = new java.io.File(w.path("t_changes"))
    val dirs = root.listFiles.filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("batch=1", "batch=2"), dirs)
    val b1Files = new java.io.File(root, "batch=1").listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(b1Files == 10, s"1000 rows / 100 per file should be 10 files, got $b1Files")
    // content through the glob reader is exactly the change rows
    val got = feed(w)
    assert(got.count(_._1 == 1L) == 1000)
    assert(got.filter(_._1 == 2L).toSet ==
      Set((2L, "update_pre", 1L, 2.0), (2L, "update_post", 1L, 99.0)))
    assert(!w.readChangeFeed(spark, "t").columns.contains("batch"),
      "glob read must not invent a batch partition column")
  }

  test("cdc: feed retention drops applied batches, keeps the frontier, idempotent") {
    val w = freshWriter()
    w.mergeByKeyCdc(spark, "t", rows(1L -> 10.0, 2L -> 20.0), "k", 1L)
    w.mergeByKeyCdc(spark, "t", rows(1L -> 11.0), "k", 2L)
    w.deleteByKeyCdc(spark, "t", Seq(2L).toDF("k"), "k", 3L)
    assert(w.truncateChangeFeed(spark, "t", beforeBatchId = 3L) == 2)
    // the surviving feed is exactly batch 3; the reader contract holds
    assert(feed(w).forall(_._1 == 3L) && feed(w).nonEmpty)
    // idempotent re-run: nothing left to drop
    assert(w.truncateChangeFeed(spark, "t", beforeBatchId = 3L) == 0)
    // the frontier witness is protected
    val e = intercept[IllegalArgumentException] {
      w.truncateChangeFeed(spark, "t", beforeBatchId = 99L)
    }
    assert(e.getMessage.contains("frontier witness"))
    // a feed that never existed is a no-op, not an error
    assert(w.truncateChangeFeed(spark, "nope", 5L) == 0)
  }

  test("cdc: index sync after retention is a no-op and serving is unchanged") {
    import graft.operators.Retrieval
    val w = freshWriter()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    w.mergeByKeyCdc(spark, "t", docs, "doc_id", 1L)
    w.mergeByKeyCdc(spark, "t",
      docs.filter(col("doc_id") % 7 === 0)
        .withColumn("text", concat(col("text"), lit(" u"))), "doc_id", 2L)
    w.deleteByKeyCdc(spark, "t",
      docs.filter(col("doc_id") % 11 === 5).select("doc_id"), "doc_id", 3L)
    Retrieval.syncBm25IndexFromFeed(spark, w, "t", "idx")
    val qs = Retrieval.queryTerms(w.readResolved(spark, "t"),
      col("doc_id") % 97 === 0, 8)
    val before = Retrieval.queryBm25Index(spark, w, "idx", qs, k = 10,
      excludeSelf = true).collect().map(_.toSeq).toSet
    val sigs = parquetFileSigs(w.path("idx_postings"))
    // batches 1–2 are applied (both legs' markers exist) — retention may
    // drop them; the re-run sync sees only batch 3, fast-paths it, and
    // must touch NOTHING
    assert(w.truncateChangeFeed(spark, "t", beforeBatchId = 3L) == 2)
    Retrieval.syncBm25IndexFromFeed(spark, w, "t", "idx")
    assert(parquetFileSigs(w.path("idx_postings")) == sigs,
      "post-retention sync re-run must be a byte-level no-op")
    val after = Retrieval.queryBm25Index(spark, w, "idx", qs, k = 10,
      excludeSelf = true).collect().map(_.toSeq).toSet
    assert(after == before && after.nonEmpty)
  }
}
