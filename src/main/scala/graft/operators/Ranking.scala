package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scale path for whole-table ntile /
  * cume_dist / percent_rank, which as `Window.orderBy(...)` with no
  * partitionBy funnels the entire input through ONE task (Spark warns
  * "Moving all data to a single partition").
  *
  * Two-pass shape that survives 100 TB:
  *   1. assign each row an ordered bucket from DETERMINISTIC quantile
  *      boundaries of the leading sort key (approx_percentile — mergeable
  *      sketch, one pass). Plain `repartitionByRange` is NOT usable here:
  *      its boundaries come from per-action reservoir sampling, so the
  *      offsets pass and the output pass can disagree on who lives where
  *      (observed as wrong ranks at sf0.1);
  *   2. per-bucket row_number (a partitionBy(bucket) window — parallel),
  *      plus a driver-collected per-bucket COUNT (≤ numBuckets rows,
  *      bounded by cluster width not data size) turned into broadcast
  *      cumulative offsets;
  *   3. global position = offset(bucket) + local row_number, from which
  *      ntile/cume_dist/percent_rank are closed-form when the order keys
  *      are a total order (unique tie-breaker — same determinism
  *      convention as every ranking in SparkEntry).
  */
object Ranking {

  /** Deterministic ordered bucketing: quantile cutpoints of the leading
    * key (collected ONCE — never re-sampled per action); bucket =
    * #cutpoints strictly below the key (monotone in the sort order, ties
    * share a bucket). Adds `__rank_bucket`.
    */
  private[operators] def bucketByKey(df: DataFrame, bucketKey: Column,
      numPartitions: Int): DataFrame = {
    val qs = (1 until numPartitions).map(_.toDouble / numPartitions)
    val cuts: Seq[Double] =
      if (qs.isEmpty) Nil
      else Option(df.select(percentile_approx(bucketKey.cast("double"),
          array(qs.map(lit): _*), lit(10000)).as("c"))
        .head().getSeq[Double](0)).getOrElse(Nil) // null ⇔ empty input
    // count-of-cuts-below as ONE aggregate() lambda over a constant-folded
    // cutpoint array — the expression tree stays O(1) in numPartitions
    // (an unrolled when-chain degrades codegen at thousands of buckets).
    val bucketExpr =
      if (cuts.isEmpty) lit(0)
      else aggregate(array(cuts.map(lit): _*), lit(0),
        (acc, c) => acc + when(bucketKey.cast("double") > c, 1).otherwise(0))
    df.withColumn("__rank_bucket", bucketExpr)
  }

  /** Per-bucket exclusive prefix totals of `measure` as a broadcastable
    * literal expression, plus the grand total. One narrow aggregation; at
    * most numPartitions rows reach the driver.
    */
  private[operators] def bucketOffsets(bucketed: DataFrame,
      measure: Column): (Column, Long) = {
    val sums = bucketed.groupBy(col("__rank_bucket"))
      .agg(sum(measure).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] =
      sums.scanLeft((0, 0L)) { case ((_, acc), (b, n)) => (b, acc + n) }
        .tail.zip(sums).map { case ((b, cum), (_, n)) => (b, cum - n) }
        .toMap
    // Buckets are dense ints in [0, numPartitions), so the offsets fold to
    // a constant array indexed by bucket — an O(1) element_at per row with
    // an O(1)-size expression tree, vs the O(buckets) when-chain this
    // replaces (empty buckets get a 0 slot that is never looked up).
    val offsetExpr =
      if (offsets.isEmpty) lit(0L)
      else {
        val dense = Array.fill(sums.map(_._1).max + 1)(0L)
        offsets.foreach { case (b, off) => dense(b) = off }
        element_at(array(dense.map(lit).toIndexedSeq: _*),
          col("__rank_bucket") + 1)
      }
    (offsetExpr, sums.map(_._2).sum)
  }

  /** Adds a 1-based global position column ordered by `keys` (which must
    * be a total order whose leading component is the numeric `bucketKey`)
    * without any single-partition exchange. Returns the frame and the
    * total row count (obtained from the same per-bucket count pass, no
    * extra job over the data).
    */
  def globalPosition(df: DataFrame, bucketKey: Column, keys: Seq[Column],
      posCol: String, numPartitions: Int): (DataFrame, Long) = {
    val bucketed = bucketByKey(df, bucketKey, numPartitions)
    val (offsetExpr, total) = bucketOffsets(bucketed, lit(1L))
    val localW = Window.partitionBy(col("__rank_bucket")).orderBy(keys: _*)
    val out = bucketed
      .withColumn(posCol, row_number().over(localW).cast("long") + offsetExpr)
      .drop("__rank_bucket")
    (out, total)
  }

  /** Closed-form SQL-standard NTILE over a total-order position: the first
    * (total mod buckets) tiles carry ceil(total/buckets) rows.
    */
  def ntileFromPosition(pos: Column, total: Long, buckets: Int): Column = {
    val base = total / buckets
    val rem = total % buckets
    val bigCut = rem * (base + 1)
    if (base == 0) pos // fewer rows than buckets: tile = position
    else {
      // Column `/` on longs is double division — floor+cast implements the
      // integer div (exact below 2^52 positions per tile boundary)
      val inBig = floor((pos - 1).cast("double") / (base + 1)).cast("long") + 1
      val inSmall =
        lit(rem) + floor((pos - 1 - bigCut).cast("double") / base).cast("long") + 1
      when(pos <= bigCut, inBig).otherwise(inSmall)
    }
  }

  /** cume_dist for a total order (no ties): pos / total. */
  def cumeDistFromPosition(pos: Column, total: Long): Column =
    pos.cast("double") / lit(total.toDouble)

  /** percent_rank for a total order (no ties): (pos-1)/(total-1). */
  def percentRankFromPosition(pos: Column, total: Long): Column =
    if (total <= 1L) lit(0.0)
    else (pos - 1).cast("double") / lit((total - 1).toDouble)
}
