package graft.operators

import graft.core.Grain
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.time.LocalDate

/** Date-spine generator (SURVEY §2.1 S4) — the Spark analogue of PG
  * `generate_series(start::date, end, interval)` (reference
  * models/metrics_monthly.sql:3-10). Built from `sequence()` + `explode`, so
  * it is a one-row driver-side literal exploded on the cluster — no data
  * motion, broadcastable to any join.
  *
  * The reference derives `end` from non-deterministic `current_date`; this
  * engine pins an explicit `asOf` date (SURVEY §4) so runs are reproducible.
  */
object DateSpine {

  /** One row per period: period_start DATE, period_end DATE (inclusive, the
    * PG `+ interval 'N x - 1 day'` convention of metrics_*.sql:6), plus the
    * PG `extract(...)::int` period number column (metrics_*.sql:7).
    */
  def spine(spark: SparkSession, grain: Grain, start: LocalDate,
      endInclusive: LocalDate): DataFrame = {
    val base = spark.range(1)
      .select(explode(expr(
        s"sequence(to_date('$start'), to_date('$endInclusive'), ${grain.step})"
      )).as("period_start_raw"))
      .select(col("period_start_raw").cast("date").as("period_start"))
    val withEnd = grain match {
      case Grain.Day     => base.withColumn("period_end", col("period_start"))
      case Grain.Week    => base.withColumn("period_end", date_add(col("period_start"), 6))
      case Grain.Month   => base.withColumn("period_end", date_sub(add_months(col("period_start"), 1), 1))
      case Grain.Quarter => base.withColumn("period_end", date_sub(add_months(col("period_start"), 3), 1))
      case Grain.Year    => base.withColumn("period_end", date_sub(add_months(col("period_start"), 12), 1))
    }
    val periodNum = grain match {
      case Grain.Day     => dayofmonth(col("period_start"))
      case Grain.Week    => weekofyear(col("period_start")) // ISO week = PG extract(week)
      case Grain.Month   => month(col("period_start"))
      case Grain.Quarter => quarter(col("period_start"))
      case Grain.Year    => year(col("period_start"))
    }
    withEnd.withColumn("period_num", periodNum.cast("int"))
  }
}
