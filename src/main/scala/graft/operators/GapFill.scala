package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular per-key series onto
  * a regular spine, filling each spine point with last-observation-
  * carried-forward and linear interpolation between the bracketing
  * observations — the standard feature-engineering step (pandas
  * `resample().ffill()` / `interpolate()`, TimescaleDB `time_bucket_gapfill`
  * + `locf` + `interpolate`) expressed as pure Spark window algebra.
  *
  * Shape (the 100 TB argument): observations and spine points are
  * UNIONed and swept twice by per-key ordered windows (ascending for the
  * previous observation, descending for the next) — all state is
  * per-key, so the job is embarrassingly parallel across keys with two
  * key-partitioned sort-window passes and no self-join of observations
  * against spine ranges (the naive range-join formulation is
  * O(obs × spine) per key; this is O(obs + spine) per key).
  *
  * Determinism: interpolation is prev + (next − prev) × ratio where the
  * ratio is a single division of exact integer microsecond differences
  * cast to double — the same IEEE expression tree the DuckDB oracle
  * evaluates, so results are bit-identical (the v1/d10 precedent). At a
  * tie between an observation and a spine point at the same instant, the
  * observation sorts first ascending and last descending: a sample taken
  * exactly on the spine counts as "at or before" (LOCF picks it up) and
  * never as its own "next".
  */
object GapFill {

  /** Hourly LOCF + linear interpolation for `(keyCol, tsCol, valCol)`
    * observations. The spine spans [min, max] observation hours,
    * inclusive, and is emitted per key; `locf_value` is null before a
    * key's first observation, `interp_value` additionally null after its
    * last (no extrapolation).
    */
  def resampleHourly(obs: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val o = obs.select(col(keyCol).as("k"), col(tsCol).as("ts"),
      col(valCol).cast("double").as("v"))
    val bounds = o.agg(date_trunc("hour", min(col("ts"))).as("h0"),
      date_trunc("hour", max(col("ts"))).as("h1"))
    val spine = bounds.select(explode(
      sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("hour_ts"))
    val keys = o.select(col("k")).distinct()
    val spineK = keys.join(broadcast(spine)) // |hours| rows — broadcast
      .select(col("k"), unix_micros(col("hour_ts")).as("t"),
        lit(1).as("is_spine"), lit(null).cast("double").as("v"),
        col("hour_ts"))
    val events = o.select(col("k"), unix_micros(col("ts")).as("t"),
      lit(0).as("is_spine"), col("v"), lit(null).cast("timestamp").as("hour_ts"))
    val u = spineK.unionByName(events)
    // v as the final order key makes the order TOTAL: two observations
    // tied on (key, t) would otherwise resolve engine-dependently and
    // break the cross-engine hash (spine rows are unique per (k, hour),
    // so the v tiebreak only ever decides between tied observations —
    // the max value wins LOCF, deterministically, in both engines)
    val wAsc = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("is_spine").asc, col("v").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(col("k"))
      .orderBy(col("t").desc, col("is_spine").desc, col("v").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pt/nt are conditioned on v IS NOT NULL exactly like pv/nv: a
    // null-VALUED observation must not anchor the interpolation bracket
    // (pv would come from an earlier row while pt pointed at the null
    // row's time — a line through a point that doesn't exist)
    val obsT = when(col("is_spine") === 0 && col("v").isNotNull, col("t"))
    u.withColumn("pv", last(col("v"), ignoreNulls = true).over(wAsc))
      .withColumn("pt", last(obsT, ignoreNulls = true).over(wAsc))
      .withColumn("nv", last(col("v"), ignoreNulls = true).over(wDesc))
      .withColumn("nt", last(obsT, ignoreNulls = true).over(wDesc))
      .filter(col("is_spine") === 1)
      .select(col("k").as(keyCol), col("hour_ts"),
        col("pv").as("locf_value"),
        when(col("pt").isNotNull && col("nt").isNotNull,
          col("pv") + (col("nv") - col("pv")) *
            ((col("t") - col("pt")).cast("double") /
              (col("nt") - col("pt")).cast("double")))
          .as("interp_value"))
  }
}
