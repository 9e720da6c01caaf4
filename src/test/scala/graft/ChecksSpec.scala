package graft

import graft.core.Checks
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  val df = Seq(
    (Some(1L), "a", "OPEN"), (Some(2L), "b", "CLOSED"),
    (Some(2L), "c", "OPEN"), (None, "d", "WEIRD"))
    .toDF("id", "name", "status")

  test("Bench.parseBudgets: strict — valid file parses, corruption fails loudly") {
    def write(s: String): String = {
      val f = java.nio.file.Files.createTempFile("budgets", ".json")
      java.nio.file.Files.writeString(f, s); f.toString
    }
    val ok = Bench.parseBudgets(write(
      "{\n  \"q1\": 0.1234,\n  \"q2\": 2.5\n}\n"))
    assert(ok == Map("q1" -> 0.1234, "q2" -> 2.5))
    // both real recorded files (sf0.01 and sf0.1) parse
    assert(Bench.parseBudgets("BENCH_BUDGETS.json").nonEmpty)
    assert(Bench.parseBudgets("BENCH_BUDGETS_sf0.1.json").nonEmpty)
    // a hand edit the old regex parse would silently drop now throws
    intercept[IllegalArgumentException](Bench.parseBudgets(write(
      "{\n  \"q1\": 0.1, // tuned\n  \"q2\": 2.5\n}\n")))
    intercept[IllegalArgumentException](Bench.parseBudgets(write(
      "{\n  \"q1\": {\"nested\": 1},\n}\n")))
    intercept[IllegalArgumentException](Bench.parseBudgets(write(
      "{\n  \"q1\": NaN\n}\n")))
    intercept[IllegalArgumentException](Bench.parseBudgets(write(
      "{\n  \"q1\": 0.1,\n  \"q1\": 0.2\n}\n")))
  }

  test("Bench.ratchet: lowering and new entries pass; a silent raise fails") {
    val prior = Map("q1" -> 1.0, "q2" -> 2.0)
    // lower + brand-new entry: allowed, fresh values win
    assert(Bench.ratchet(prior, Seq("q1" -> 0.5, "q3" -> 9.0), Set.empty)
      == Right(Map("q1" -> 0.5, "q3" -> 9.0)))
    // an unnamed raise is REFUSED and names the offender
    assert(Bench.ratchet(prior, Seq("q1" -> 0.5, "q2" -> 4.0), Set.empty)
      == Left(Seq("q2")))
    // naming the entry in --raise authorizes exactly that raise
    assert(Bench.ratchet(prior, Seq("q1" -> 0.5, "q2" -> 4.0), Set("q2"))
      == Right(Map("q1" -> 0.5, "q2" -> 4.0)))
    // authorization is per-entry: q2 named, q1 still refused
    assert(Bench.ratchet(prior, Seq("q1" -> 1.5, "q2" -> 4.0), Set("q2"))
      == Left(Seq("q1")))
  }

  test("Bench.recheck: a slow-then-fast entry is load skew, not a regression") {
    val budgets = Map("slow" -> 1.0, "bad" -> 1.0, "ok" -> 1.0)
    var measured = List.empty[String]
    val remeasure: String => Double = { n =>
      measured ::= n
      n match {
        case "slow" => 0.9  // transient spike: re-measure lands in budget
        case "bad"  => 9.5  // real regression: still far over
        case other  => fail(s"re-measured $other, which was never flagged")
      }
    }
    val (viol, rem) = Bench.recheck(budgets,
      Seq("slow" -> 11.0, "bad" -> 10.0, "ok" -> 0.8, "nobudget" -> 99.0),
      remeasure)
    // only the flagged entries were re-measured, each exactly once
    assert(measured.sorted == List("bad", "slow"))
    assert(rem == Map("slow" -> 0.9, "bad" -> 9.5))
    // the spike is cleared (best of 11.0/0.9 is in budget); the real
    // regression stands with its BEST time; no-budget entries never flag
    assert(viol == Seq(("bad", 9.5, 1.0)))
  }

  test("Bench.recheck: border arithmetic matches the check rule") {
    // over requires BOTH >2x and >+0.5s: 1.4s vs 1.0 budget is within
    assert(!Bench.overBudget(1.4, 1.0))
    // 0.4s vs 0.1: >2x but inside the 0.5s absolute grace
    assert(!Bench.overBudget(0.4, 0.1))
    // 2.6s vs 1.0: both bounds exceeded
    assert(Bench.overBudget(2.6, 1.0))
    // re-measure that is WORSE than the first pass: best (first) decides
    val (viol, _) = Bench.recheck(Map("q" -> 1.0), Seq("q" -> 2.6), _ => 5.0)
    assert(viol == Seq(("q", 2.6, 1.0)))
  }

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
