package graft

import graft.core.Checks
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  val df = Seq(
    (Some(1L), "a", "OPEN"), (Some(2L), "b", "CLOSED"),
    (Some(2L), "c", "OPEN"), (None, "d", "WEIRD"))
    .toDF("id", "name", "status")

  test("aggregate checks report violation counts in one pass") {
    val report = Checks.run(df, Seq(
      Checks.notNull("id"),
      Checks.unique("id"),
      Checks.acceptedValues("status", Seq("OPEN", "CLOSED")),
      Checks.notNull("name")))
      .as[(String, Long)].collect().toMap
    assert(report("not_null(id)") == 1L)     // the None row
    assert(report("unique(id)") == 1L)       // id=2 twice → 1 extra row
    assert(report("accepted_values(status)") == 1L) // WEIRD
    assert(report("not_null(name)") == 0L)
  }

  test("referential integrity via left-anti join") {
    val dim = Seq(1L, 2L).toDF("pk")
    val bad = Checks.referentialViolations(
      Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk"), "fk", dim, "pk")
    assert(bad == 1L) // only 9 violates; null fk is not a violation
  }

  test("checks pass on the reference pipeline's classified output shape") {
    val cc = Seq(("t1", "wayfair", "Home"), ("t2", "misc", "Food"))
      .toDF("key", "merchant_key", "category")
    val report = Checks.run(cc, Seq(
      Checks.notNull("key"), Checks.unique("key"),
      Checks.notNull("merchant_key")))
    assert(report.filter(col("violations") > 0).count() == 0)
  }
}
