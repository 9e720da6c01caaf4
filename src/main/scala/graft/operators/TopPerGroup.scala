package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-1 / top-k per group — the Spark rewrite of the reference's
  * `LEFT JOIN LATERAL ... ORDER BY ... LIMIT 1` (SURVEY §2.3 J3/J4, reference
  * models/classified_card_transactions.sql:126-147,152-184) and of the
  * window-dedup pattern (§2.5 W3, classified_card_transactions.sql:211-220).
  *
  * Implementation: row_number over a window. At scale this is a single
  * hash-partitioned shuffle on the group keys; no per-row nested loop.
  */
object TopPerGroup {

  def top1(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column]): DataFrame =
    topK(df, 1, partitionBy, orderBy)

  /** Keeps `__rank` (1-based) when k > 1; for k == 1 the rank column is
    * dropped (it is constant). Order columns MUST form a total order within
    * each group for deterministic results — always append a unique
    * tie-breaker.
    */
  def topK(df: DataFrame, k: Int, partitionBy: Seq[Column],
      orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    val ranked = df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
    if (k == 1) ranked.drop("__rank") else ranked
  }
}
