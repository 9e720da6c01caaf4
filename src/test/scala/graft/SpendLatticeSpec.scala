package graft

import org.apache.spark.sql.functions._

/** q97 — the five-grain spend lattice: one corpus pass must (a) plan as
  * a single Expand + one aggregation exchange (the point of the
  * rewrite: five reference tables for one read), and (b) agree row-for-
  * row with computing each grain separately (q5's shape).
  */
class SpendLatticeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("lattice plans as one Expand and one shuffle") {
    val df = SparkEntry.queries("q97_spend_lattice")(spark, dir)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("Expand"), "grouping-sets Expand missing")
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(physical).size
    assert(exchanges == 1,
      s"expected exactly 1 aggregation exchange, saw $exchanges:\n$physical")
  }

  test("lattice rows equal the per-grain rollups") {
    val lattice = SparkEntry.queries("q97_spend_lattice")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getString(2),
        r.getDouble(3), r.getLong(4))).toSet
    val separate = Seq("day" -> "q5_spend_daily", "week" -> "q5_spend_weekly",
      "month" -> "q5_spend_monthly", "quarter" -> "q5_spend_quarterly",
      "year" -> "q5_spend_yearly").flatMap { case (g, entry) =>
      SparkEntry.queries(entry)(spark, dir).collect()
        .map(r => (g, r.getDate(0).toString, r.getString(1),
          r.getDouble(2), r.getLong(3)))
    }.toSet
    assert(lattice == separate)
    assert(lattice.nonEmpty)
    assert(lattice.map(_._1) == Set("day", "week", "month", "quarter", "year"))
  }
}
