package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style per-column statistics — the operator that feeds a cost
  * model (join-side broadcast decisions, partition sizing) and data
  * contracts (null/ndv drift alarms): for each requested column, row
  * count, non-null count, EXACT distinct count, and min/max rendered as
  * strings so heterogeneous columns share one output schema.
  *
  * Scale shape: ONE pass over the data. All per-column aggregates ride a
  * single `agg` — Spark plans the multiple DISTINCT aggregates via
  * Expand (each input row replicated once per distinct-column), which is
  * the exact-answer cost at 100 TB: shuffle volume grows with
  * `cols.size`, not with extra passes. Partial aggregation still applies
  * (count/min/max combine map-side; the Expand streams). When exactness
  * isn't required at full scale, the KMV sketch path (q19,
  * [[graft.operators.Sketches]]) is the cheap alternative — this
  * operator is the truth it's validated against. The reshape to
  * one-row-per-column happens on the SINGLE aggregated row (driver-free,
  * no extra scan).
  */
object TableStats {

  def collect(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "TableStats.collect needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("column_name"), col("__n").as("n_rows"),
        col(s"__cnt_$c").as("n_nonnull"),
        col(s"__ndv_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
    }
    one.select(explode(array(perCol: _*)).as("s")).select("s.*")
  }
}
