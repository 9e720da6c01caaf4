package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the SparkEntry registry itself — the round-6 post-mortem
  * mechanism: a query that broke could silently VANISH from the round's
  * correctness artifacts because nothing asserted the registry's size or
  * its queries↔oracle pairing. These checks need no SparkSession.
  */
class EntryRegistrySpec extends AnyFunSuite {

  /** Raise this floor every time entries are added; it must NEVER go
    * down — a shrinking registry means deleted coverage, which needs a
    * deliberate edit here to acknowledge.
    */
  private val entryFloor = 231

  test(s"registry never shrinks below its recorded floor ($entryFloor)") {
    assert(SparkEntry.queries.size >= entryFloor,
      s"queries registry shrank: ${SparkEntry.queries.size} < $entryFloor")
  }

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without a query: ${(o -- q).toSeq.sorted}")
    // the repo's standing invariant is FULL oracle coverage (the driver
    // downgrades missing oracles to rows-only checks — never rely on that)
    assert((q -- o).isEmpty, s"queries without an oracle: ${(q -- o).toSeq.sorted}")
  }

  test("oracle SQL is non-empty") {
    // (no statement-count check: oracles legitimately carry ';' inside
    // embedded regex-rule and text literals)
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
    }
  }
}
