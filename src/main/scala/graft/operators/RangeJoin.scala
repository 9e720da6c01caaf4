package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the second classic "Spark lacks the
  * operator" case (alongside [[AsOfJoin]]). A naive
  * `points.join(intervals, p >= lo && p <= hi)` plans as a broadcast
  * nested-loop / cartesian: O(points × intervals) comparisons. The bucketized
  * form maps both sides onto fixed-width buckets (intervals explode to every
  * bucket they overlap), equi-joins on the bucket id — one hash shuffle,
  * candidates only within a bucket — then re-applies the exact predicate.
  * Result is identical to the naive join; cost drops to
  * O(points + intervals × avgSpan/bucketWidth + candidates).
  */
object RangeJoin {

  /** Join each point row to every interval row with lo <= point <= hi.
    * `bucketWidth` should be on the order of the typical interval span.
    * Additional equi-keys can be folded into the bucket join via `keys`.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      bucketWidth: Double, keys: Seq[String] = Nil): DataFrame = {
    val pBucket = floor(col(pointCol) / bucketWidth).cast("long")
    val p = points.withColumn("__bucket", pBucket)

    val iv = intervals
      .withColumn("__bucket", explode(expr(
        s"sequence(CAST(floor(`$loCol` / $bucketWidth) AS LONG), " +
          s"CAST(floor(`$hiCol` / $bucketWidth) AS LONG))")))

    p.join(iv, keys :+ "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval-overlap join: every (left, right) pair whose
    * [lLo, lHi] ∩ [rLo, rHi] ≠ ∅ — the third classic missing operator
    * (temporal overlap, genomic ranges). Both sides explode to the
    * fixed-width buckets they span and equi-join on the bucket; a
    * qualifying pair shares every bucket its OVERLAP spans, so the pair
    * is emitted only from the bucket containing the overlap's start
    * (`floor(max(lLo, rLo) / w)`) — exactly-once without a distinct.
    * Column names must be disjoint across the two sides (as with any
    * self-describing join output).
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String,
      bucketWidth: Double, keys: Seq[String] = Nil): DataFrame = {
    def spanned(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("__bucket", explode(expr(
        s"sequence(CAST(floor(`$lo` / $bucketWidth) AS LONG), " +
          s"CAST(floor(`$hi` / $bucketWidth) AS LONG))")))
    spanned(left, lLo, lHi).join(spanned(right, rLo, rHi), keys :+ "__bucket")
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bucket") ===
        floor(greatest(col(lLo), col(rLo)) / bucketWidth).cast("long"))
      .drop("__bucket")
  }
}
