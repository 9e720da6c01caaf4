package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training prep: documents laid head-to-tail on
  * a token tape in a deterministic order, sequences cut every `budget`
  * tokens. Each doc maps to the sequence containing its first token and
  * its offset inside it (docs longer than the remaining room span
  * sequences — the training-side reader chunks them; contiguous packing
  * wastes zero tokens by construction).
  *
  * The global exclusive prefix-sum is the scale problem: a bare
  * `Window.orderBy(id)` funnels the corpus through ONE task. Same cure as
  * [[Ranking.globalPosition]]: quantile-cutpoint bucketing (collected
  * once — never re-sampled per action), per-bucket window sums, and
  * driver-collected per-bucket totals (≤ numPartitions rows) as offsets.
  */
object Packing {

  /** Adds `seq_id` (which sequence the doc starts in) and `seq_offset`
    * (token offset inside that sequence) plus `tape_start` (global
    * exclusive prefix sum). All integer arithmetic — exactly reproducible
    * in any engine.
    */
  def packSequences(df: DataFrame, idCol: Column, tokenCol: Column,
      budget: Long, numPartitions: Int = 32): DataFrame = {
    require(budget > 0, "budget must be positive")
    val qs = (1 until numPartitions).map(_.toDouble / numPartitions)
    val cuts: Seq[Double] =
      if (qs.isEmpty) Nil
      else df.select(percentile_approx(idCol.cast("double"),
          array(qs.map(lit): _*), lit(10000)).as("c"))
        .head().getSeq[Double](0)
    val bucketExpr = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(idCol.cast("double") > lit(c), 1).otherwise(0)
    }
    val bucketed = df.withColumn("__pack_bucket", bucketExpr)
      .withColumn("__toks", tokenCol.cast("long"))
    val sums = bucketed.groupBy(col("__pack_bucket"))
      .agg(sum(col("__toks")).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] =
      sums.scanLeft((0, 0L)) { case ((_, acc), (b, s)) => (b, acc + s) }
        .tail.zip(sums).map { case ((b, cum), (_, s)) => (b, cum - s) }
        .toMap
    val offsetExpr = offsets.foldLeft(lit(0L)) { case (acc, (b, off)) =>
      when(col("__pack_bucket") === b, lit(off)).otherwise(acc)
    }
    val w = Window.partitionBy(col("__pack_bucket")).orderBy(idCol)
    val start = sum(col("__toks")).over(w) - col("__toks") + offsetExpr
    bucketed
      .withColumn("tape_start", start)
      // integer division on purpose: `/` on longs is double division
      .withColumn("seq_id", expr(s"tape_start div ${budget}"))
      .withColumn("seq_offset", pmod(col("tape_start"), lit(budget)))
      .drop("__pack_bucket", "__toks")
  }
}
