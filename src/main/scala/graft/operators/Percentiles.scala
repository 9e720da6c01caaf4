package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Percentile band bounds with an explicit exact/approx switch.
  *
  * `exact = true` runs SQL `percentile()` — PG-interpolated, bit-matchable
  * by DuckDB's quantile_cont, the ORACLE form. Its aggregation buffer holds
  * every distinct value with counts, which on a corpus-scale column is a
  * driver/executor OOM — never run it at 100 TB.
  *
  * `exact = false` runs `approx_percentile` (Greenwald-Khanna sketch):
  * mergeable, bounded memory O(accuracy), one partial-agg shuffle — the
  * scale path. It returns an actual data value (no interpolation), so
  * results can differ from the exact form by at most one neighboring value
  * at each band edge.
  */
object Percentiles {

  /** 1-row frame with `__lo`/`__hi` percentile bounds of `c`. */
  def bandBounds(df: DataFrame, c: Column, loQ: Double, hiQ: Double,
      exact: Boolean, accuracy: Int = 10000): DataFrame =
    if (exact)
      df.agg(
        percentile(c, lit(loQ)).as("__lo"),
        percentile(c, lit(hiQ)).as("__hi"))
    else
      df.agg(percentile_approx(c, array(lit(loQ), lit(hiQ)), lit(accuracy))
          .as("__b"))
        .select(
          element_at(col("__b"), 1).cast("double").as("__lo"),
          element_at(col("__b"), 2).cast("double").as("__hi"))

  /** Keep rows of `df` whose `c` lies inside the [loQ, hiQ] percentile
    * band. The bounds frame is 1 row — broadcast, no shuffle of `df`.
    */
  def bandFilter(df: DataFrame, c: Column, loQ: Double, hiQ: Double,
      exact: Boolean, accuracy: Int = 10000): DataFrame =
    df.crossJoin(broadcast(bandBounds(df, c, loQ, hiQ, exact, accuracy)))
      .filter(c >= col("__lo") && c <= col("__hi"))
      .drop("__lo", "__hi")
}
