package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grain-keyed COUNT/SUM summary view from
  * a CDC change feed — the REFRESH half of the MV story (q91 proved the
  * fold, [[graft.plans.MvRewrite]] consumes the result, q121/q125
  * compensate for staleness at query time; this keeps the view itself
  * near-fresh at delta cost): each refresh folds ONLY the feed batches
  * past the view's recorded frontier into signed per-grain deltas and
  * merges them with the existing (grain-sized) view — O(|tail| +
  * |grain|) work, never a base-table read.
  *
  * Durability: the frontier is a `_frontier` file written INSIDE the
  * staged view directory before the atomic directory swap, so view and
  * frontier commit together — a torn refresh can never leave a view
  * claiming the wrong frontier. (Underscore-prefixed files are hidden
  * from Spark's input listing, so readers of the view parquet never see
  * it.) The swap is delete-then-rename: a crash between the two leaves
  * NO view, which the rewrite's missing-view fallback degrades to a
  * correct base scan, and the next refresh detects (no frontier) and
  * rebuilds from the full feed. Re-running with no new batches is a
  * no-op that leaves the view directory untouched.
  *
  * Deletes that empty a grain drop its row (n ≤ 0 filtered), matching
  * the fold q91 pins and the HAVING-net discipline the rewrite applies
  * to compensated tails.
  */
object MvMaintain {

  /** `sumCols`: base measure column name → view sum column name. Grain
    * values must be non-null (they are grouping keys on both sides of
    * the merge join).
    */
  final case class ViewDef(grain: Seq[String],
      sumCols: Map[String, String], countCol: String = "n")

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** The frontier recorded by the last committed refresh, or None if no
    * (committed) view exists.
    */
  def frontier(spark: SparkSession, mvPath: String): Option[Long] = {
    val f = new org.apache.hadoop.fs.Path(mvPath, "_frontier")
    val fs = fsOf(spark, f)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      finally in.close()
    }
  }

  private def feedBatchIds(spark: SparkSession, feedRoot: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(feedRoot)
    val fs = fsOf(spark, root)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=").toLong).sorted
  }

  /** Fold the feed tail past the recorded frontier into the view.
    * Returns the new frontier (unchanged if there was nothing to fold).
    */
  def refresh(spark: SparkSession, feedRoot: String, mvPath: String,
      v: ViewDef): Long = {
    val fr = frontier(spark, mvPath)
    val ids = feedBatchIds(spark, feedRoot)
    require(ids.nonEmpty, s"refresh: no feed batches under $feedRoot")
    val tailIds = fr.map(f => ids.filter(_ > f)).getOrElse(ids)
    if (tailIds.isEmpty) return fr.get
    val newFrontier = tailIds.max

    val tail = spark.read.parquet(
      tailIds.map(id => s"$feedRoot/batch=$id"): _*)
    val pos = col("change_op").isin("insert", "update_post")
    val sign = when(pos, lit(1L)).otherwise(lit(-1L))
    val mKeys = v.sumCols.keys.toSeq.sorted
    val deltas = tail.groupBy(v.grain.map(col): _*)
      .agg(sum(sign).as("__dn"),
        mKeys.map(m => sum(when(pos, col(m)).otherwise(-col(m)))
          .as(s"__d_$m")): _*)

    val merged: DataFrame = fr match {
      case None =>
        deltas.select(v.grain.map(col) ++
          Seq(col("__dn").as(v.countCol)) ++
          mKeys.map(m => col(s"__d_$m").as(v.sumCols(m))): _*)
      case Some(_) =>
        val old = spark.read.parquet(mvPath)
        val schema = old.schema
        // column types stay pinned to the first-committed view schema,
        // so refresh == full-refold frame-for-frame at any depth
        old.join(deltas, v.grain, "full_outer")
          .select(v.grain.map(col) ++
            Seq((coalesce(col(v.countCol), lit(0L)) +
              coalesce(col("__dn"), lit(0L)))
              .cast(schema(v.countCol).dataType).as(v.countCol)) ++
            mKeys.map { m =>
              val s = v.sumCols(m)
              (coalesce(col(s), lit(0).cast(schema(s).dataType)) +
                coalesce(col(s"__d_$m"), lit(0).cast(schema(s).dataType)))
                .cast(schema(s).dataType).as(s)
            }: _*)
    }
    val alive = merged.filter(col(v.countCol) > 0)

    // stage → embed frontier → atomic-ish swap (crash between delete
    // and rename leaves NO view: rewrite falls back to the base scan,
    // next refresh rebuilds from the full feed)
    val tmp = s"${mvPath}__stage"
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val mvP = new org.apache.hadoop.fs.Path(mvPath)
    val fs = fsOf(spark, mvP)
    if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
    alive.write.mode("overwrite").parquet(tmp)
    val frFile = new org.apache.hadoop.fs.Path(tmpPath, "_frontier")
    val out = fs.create(frFile, true)
    try out.write(newFrontier.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(mvP)) fs.delete(mvP, true)
    require(fs.rename(tmpPath, mvP),
      s"refresh: rename $tmp -> $mvPath failed")
    newFrontier
  }
}
