package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-rollup grain. The reference repeats each rollup model verbatim at 4-5
  * grains differing only in the `date_trunc` argument (e.g.
  * reference models/plants_weekly.sql:3 vs models/plants_yearly.sql:3); here a
  * grain is a first-class parameter so one transformation covers the family.
  */
sealed abstract class Grain(val key: String) {
  /** SQL interval literal stepping one period (for date spines). */
  def step: String
}

object Grain {
  case object Day     extends Grain("day")     { val step = "interval 1 day"   }
  case object Week    extends Grain("week")    { val step = "interval 1 week"  }
  case object Month   extends Grain("month")   { val step = "interval 1 month" }
  case object Quarter extends Grain("quarter") { val step = "interval 3 month" }
  case object Year    extends Grain("year")    { val step = "interval 1 year"  }

  val all: Seq[Grain] = Seq(Day, Week, Month, Quarter, Year)

  def fromKey(k: String): Grain =
    all.find(_.key == k.toLowerCase).getOrElse(
      throw new IllegalArgumentException(s"unknown grain: $k"))

  /** Truncate a date/timestamp column to the grain's period start, as DATE.
    * Matches Postgres `date_trunc` semantics (weeks start Monday in both
    * engines; reference models/metrics_weekly.sql:9 relies on this).
    */
  def periodStart(c: Column, g: Grain): Column =
    date_trunc(g.key, c).cast("date")
}
