package graft.operators

import graft.core.Grain
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grain-parameterized rollups — one transformation per reference family
  * instead of one file per grain (SURVEY intro: the 4 time grains of each
  * family are verbatim copies differing only in the `date_trunc` argument;
  * e.g. reference models/plants_weekly.sql vs models/plants_yearly.sql, and
  * models/spend_{daily,weekly,monthly,quarterly,yearly}.sql).
  *
  * Scale notes: each rollup is a single partial-aggregated shuffle on
  * (period, groupCols). Map-side combine collapses rows before the exchange;
  * no window or join is involved, so the plan is one Exchange + HashAggregate
  * pair regardless of input size.
  */
object Rollups {

  /** Entity-count family (reference models/{recipes,plants,workouts}_*.sql):
    * count(*) and count(distinct entity) per period.
    */
  def entityCounts(df: DataFrame, dateCol: Column, entityCol: Column,
      grain: Grain): DataFrame =
    df.groupBy(Grain.periodStart(dateCol, grain).as("date_period"))
      .agg(
        count(lit(1)).as("n_rows"),
        countDistinct(entityCol).as("n_distinct"))

  /** Spend family (reference models/spend_*.sql:12-27): sum of a measure per
    * period and grouping columns. `measure` should already carry exact
    * (decimal) type — pass e.g. `col("amount").cast(DecimalType(18,2))`.
    */
  def measureRollup(df: DataFrame, dateCol: Column, grain: Grain,
      groupCols: Seq[(String, Column)], measures: Seq[Column]): DataFrame = {
    val keys = Grain.periodStart(dateCol, grain).as("date_period") +:
      groupCols.map { case (n, c) => c.as(n) }
    df.groupBy(keys: _*).agg(measures.head, measures.tail: _*)
  }
}
