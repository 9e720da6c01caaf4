package graft

import graft.operators.Snapshot
import org.apache.spark.sql.functions._

/** pointInTime (q98) boundary semantics on a hand-built SCD2 history:
  * inclusive valid_from (a fact ON the change date sees the NEW
  * version), exclusive valid_to, nulls before a key's first version,
  * and nulls after a close with no successor (deleted keys).
  */
class PointInTimeSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("facts pick the version valid at their own date") {
    val v1 = Seq((1L, 100.0), (2L, 200.0)).toDF("k", "price")
    val v2 = Seq((1L, 111.0)).toDF("k", "price") // k=2 deleted, k=1 changed
    val s1 = Snapshot.scd2(None, v1, "k", Seq("price"), d("2024-01-01"))
    val snap = Snapshot.scd2(Some(s1), v2, "k", Seq("price"),
      d("2024-02-01"), closeDeleted = true)

    val facts = Seq(
      (1L, "2023-12-31"), (1L, "2024-01-01"), (1L, "2024-01-31"),
      (1L, "2024-02-01"), (1L, "2024-03-01"),
      (2L, "2024-01-15"), (2L, "2024-02-01"), (2L, "2024-03-01"))
      .toDF("k", "fd").select(col("k"), to_date(col("fd")).as("fd"))

    val out = Snapshot.pointInTime(snap, facts, "k", "fd", Seq("price"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString,
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet

    assert(out == Set(
      (1L, "2023-12-31", None),        // before birth
      (1L, "2024-01-01", Some(100.0)), // valid_from inclusive
      (1L, "2024-01-31", Some(100.0)),
      (1L, "2024-02-01", Some(111.0)), // ON the change date → NEW version
      (1L, "2024-03-01", Some(111.0)),
      (2L, "2024-01-15", Some(200.0)),
      (2L, "2024-02-01", None),        // deleted: valid_to exclusive
      (2L, "2024-03-01", None)))       // stays null after the close
  }

  test("dim_valid_from reports the matched version's start") {
    val v1 = Seq((1L, 100.0)).toDF("k", "price")
    val snap = Snapshot.scd2(None, v1, "k", Seq("price"), d("2024-01-01"))
    val facts = Seq((1L, "2024-06-01")).toDF("k", "fd")
      .select(col("k"), to_date(col("fd")).as("fd"))
    val r = Snapshot.pointInTime(snap, facts, "k", "fd", Seq("price"))
      .collect()(0)
    assert(r.getDate(r.fieldIndex("dim_valid_from")).toString == "2024-01-01")
  }
}
