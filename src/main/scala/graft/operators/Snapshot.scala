package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dbt-style SCD Type-2 snapshots (`dbt snapshot`, check strategy): the
  * snapshot table carries every key's history as rows with
  * `valid_from`/`valid_to` (null `valid_to` = currently open). Each run
  * merges the source's current state at `asOf`:
  *
  *  - key in both, checked columns unchanged → open row survives as-is
  *  - key in both, any checked column changed → the open row closes at
  *    `asOf` and a new open row begins at `asOf`
  *  - key only in the source (new) → a new open row begins at `asOf`
  *  - key only in the snapshot (disappeared) → the open row stays open
  *    (dbt's default; pass `closeDeleted = true` for
  *    invalidate_hard_deletes semantics)
  *
  * `key` must be unique within one source state (dbt's unique_key
  * contract — duplicate keys would fan out the merge join).
  *
  * Scale shape: ONE full-outer join on the key per run plus the
  * carried-forward closed history (a union, no shuffle). At 100 TB
  * bucket the snapshot table by the key so the daily merge is
  * exchange-free on the snapshot side; closed history is append-only
  * and never rewritten.
  */
object Snapshot {

  def scd2(prior: Option[DataFrame], src: DataFrame, key: String,
      checkCols: Seq[String], asOf: java.sql.Date,
      closeDeleted: Boolean = false): DataFrame = {
    val cols = key +: checkCols
    val srcN = src.select(cols.map(col): _*)
    prior match {
      case None =>
        srcN.withColumn("valid_from", lit(asOf))
          .withColumn("valid_to", lit(null).cast("date"))
      case Some(p) =>
        val closed = p.filter(col("valid_to").isNotNull)
        val open = p.filter(col("valid_to").isNull)
          .withColumn("__in_o", lit(1))
        val s = srcN.withColumn("__in_s", lit(1))
        val j = open.alias("o")
          .join(s.alias("s"), col(s"o.$key") === col(s"s.$key"), "full_outer")
        val inBoth = col("o.__in_o").isNotNull && col("s.__in_s").isNotNull
        // null-safe per-column compare — a checked column flipping
        // to/from null IS a change
        val changed = inBoth && checkCols
          .map(c => !(col(s"o.$c") <=> col(s"s.$c"))).reduce(_ || _)
        val oOnly = col("o.__in_o").isNotNull && col("s.__in_s").isNull
        val sOnly = col("o.__in_o").isNull && col("s.__in_s").isNotNull

        val oCols = cols.map(c => col(s"o.$c").as(c)) :+
          col("o.valid_from").as("valid_from")
        val sCols = cols.map(c => col(s"s.$c").as(c))

        val surviving = j
          .filter((inBoth && !changed) || (oOnly && lit(!closeDeleted)))
          .select(oCols :+ lit(null).cast("date").as("valid_to"): _*)
        val closedNow = j
          .filter(changed || (oOnly && lit(closeDeleted)))
          .select(oCols :+ lit(asOf).as("valid_to"): _*)
        val openedNow = j
          .filter(changed || sOnly)
          .select(sCols :+ lit(asOf).as("valid_from")
            :+ lit(null).cast("date").as("valid_to"): _*)

        closed.select((cols :+ "valid_from" :+ "valid_to").map(col): _*)
          .unionByName(surviving)
          .unionByName(closedNow)
          .unionByName(openedNow)
    }
  }
}
