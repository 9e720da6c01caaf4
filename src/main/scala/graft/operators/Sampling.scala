package graft.operators

import graft.functions.SimHashTokenHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus mixing — the "take 50% of English,
  * 10% of everything else" stage of a training-data pipeline. Membership
  * is a pure function of the row id (shared-arithmetic hash < rate·M), so
  * the sample is: reproducible across runs/engines (the driver oracle
  * replays it), stable under repartitioning, and a strict subset/superset
  * relation holds between any two rates of the same group (raising a quota
  * only ADDS documents — the property curriculum schedules rely on).
  * Plan shape: a filter in the scan, zero shuffles.
  */
object Sampling {

  private val M = SimHashTokenHash.M

  /** Per-group hash thresholds as exact long literals (single source for
    * the Spark filter and the SQL oracle).
    */
  def thresholds(rates: Map[String, Double], defaultRate: Double):
      (Map[String, Long], Long) =
    (rates.map { case (g, r) => g -> (r * M).toLong }, (defaultRate * M).toLong)

  /** Keep rows whose id-hash falls under their group's quota threshold. */
  def quotaSample(df: DataFrame, groupCol: Column, idCol: Column,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val (ts, dt) = thresholds(rates, defaultRate)
    val threshold = ts.foldLeft(lit(dt)) { case (acc, (g, t)) =>
      when(groupCol === g, lit(t)).otherwise(acc)
    }
    df.filter(Sketches.numHash(idCol) < threshold)
  }
}
