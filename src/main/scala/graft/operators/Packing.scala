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
    * in any engine. `idCol` must be UNIQUE: it is the tape order, and
    * tied ids would overlap tape positions (the default RANGE window
    * frame would even double-count ties — the ROWS frame below plus the
    * uniqueness contract keeps positions disjoint and deterministic).
    */
  def packSequences(df: DataFrame, idCol: Column, tokenCol: Column,
      budget: Long, numPartitions: Int = 32): DataFrame = {
    require(budget > 0, "budget must be positive")
    // the same bucket-and-offset machinery as Ranking.globalPosition,
    // with the measure = token count instead of 1 row
    val bucketed = Ranking.bucketByKey(df, idCol, numPartitions)
      .withColumn("__toks", tokenCol.cast("long"))
    val (offsetExpr, _) = Ranking.bucketOffsets(bucketed, col("__toks"))
    val w = Window.partitionBy(col("__rank_bucket")).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val start = sum(col("__toks")).over(w) - col("__toks") + offsetExpr
    bucketed
      .withColumn("tape_start", start)
      // integer division on purpose: `/` on longs is double division
      .withColumn("seq_id", expr(s"tape_start div ${budget}"))
      .withColumn("seq_offset", pmod(col("tape_start"), lit(budget)))
      .drop("__rank_bucket", "__toks")
  }
}
