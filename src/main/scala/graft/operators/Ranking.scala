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
  *   1. range-repartition on the order keys (distributed sort), tag each
  *      row with its range-partition id;
  *   2. per-partition row_number (a partitionBy(pid) window — parallel),
  *      plus a driver-collected per-partition COUNT (≤ numPartitions rows,
  *      bounded by cluster width not data size) turned into broadcast
  *      cumulative offsets;
  *   3. global position = offset(pid) + local row_number, from which
  *      ntile/cume_dist/percent_rank are closed-form when the order keys
  *      are a total order (unique tie-breaker — same determinism
  *      convention as every ranking in SparkEntry).
  */
object Ranking {

  /** Adds a 1-based global position column ordered by `keys` (which must be
    * a total order) without any single-partition exchange. Returns the
    * frame and the total row count (obtained from the same per-partition
    * count pass, no extra job over the data).
    */
  def globalPosition(df: DataFrame, keys: Seq[Column], posCol: String,
      numPartitions: Int): (DataFrame, Long) = {
    val ranged = df.repartitionByRange(numPartitions, keys: _*)
      .withColumn("__rank_pid", spark_partition_id())
    // one narrow count pass; at most numPartitions rows reach the driver
    val counts = ranged.groupBy(col("__rank_pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] =
      counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
        .tail.zip(counts).map { case ((pid, cum), (_, n)) => (pid, cum - n) }
        .toMap
    val total = counts.map(_._2).sum
    val offsetExpr = offsets.foldLeft(lit(0L)) { case (acc, (pid, off)) =>
      when(col("__rank_pid") === pid, lit(off)).otherwise(acc)
    }
    val localW = Window.partitionBy(col("__rank_pid")).orderBy(keys: _*)
    val out = ranged
      .withColumn(posCol, row_number().over(localW).cast("long") + offsetExpr)
      .drop("__rank_pid")
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
