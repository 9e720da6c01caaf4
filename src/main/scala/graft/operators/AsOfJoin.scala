package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, the latest right row whose
  * timestamp is ≤ the left row's timestamp, within equal partition keys —
  * the time-series primitive Spark has no built-in operator for.
  *
  * Spark-first composition instead of a custom SparkPlan: tag both sides,
  * union, and take `last(..., ignoreNulls)` over a (keys)-partitioned window
  * ordered by (time, side). This is ONE shuffle on the keys and a sort
  * within partitions — strictly better than the naive inequality join
  * (which explodes to O(left×right) per key before aggregation), and the
  * window form AQE-partitions like any other shuffle. A custom physical
  * operator would only add a fused sort-merge; the plan shape is already
  * optimal, which is why this stays a library operator (SURVEY §4 stance:
  * custom Catalyst only where built-ins genuinely can't express the
  * semantics or the plan is structurally worse).
  */
object AsOfJoin {

  /** `rightVals` are attached to each left row as `asof_<name>` (null when
    * no right row precedes). The right row's own timestamp arrives as
    * `asof_ts`. Ties (equal timestamps) include the right row, matching
    * ASOF `>=` semantics.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val rv = struct(
      (col(rightTs).as("asof_ts") +: rightVals.map(c => col(c).as(s"asof_$c"))): _*)
    val taggedRight = right.select(
      keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+ rv.as("__rv"): _*)
    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(taggedRight.schema("__rv").dataType))

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    // __rv as the final order key: right rows tied on (ts) resolve
    // deterministically (greatest value struct wins); left rows' null __rv
    // sorts last within their (ts, side) slot and never affects the match.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__rv").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__rv")
      .select((left.columns.map(col) :+ col("__match.asof_ts").as("asof_ts")) ++
        rightVals.map(c => col(s"__match.asof_$c").as(s"asof_$c")): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row whose
    * timestamp is ≥ the left row's (the "next event after" primitive —
    * mirror of [[backward]], same one-shuffle union+window shape with the
    * frame reversed). Ties (equal timestamps) match, per ASOF `<=`
    * semantics; tied right rows resolve to the least value struct.
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val rv = struct(
      (col(rightTs).as("asof_ts") +: rightVals.map(c => col(c).as(s"asof_$c"))): _*)
    val taggedRight = right.select(
      keys.map(col) :+ col(rightTs).as("__ts") :+ lit(1).as("__side") :+ rv.as("__rv"): _*)
    val taggedLeft = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(0)) // left BEFORE same-ts right rows, so
                                    // the following-frame sees the tie
      .withColumn("__rv", lit(null).cast(taggedRight.schema("__rv").dataType))

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__rv").asc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    unioned
      .withColumn("__match", first(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .drop("__ts", "__side", "__rv")
      .select((left.columns.map(col) :+ col("__match.asof_ts").as("asof_ts")) ++
        rightVals.map(c => col(s"__match.asof_$c").as(s"asof_$c")): _*)
  }
}
