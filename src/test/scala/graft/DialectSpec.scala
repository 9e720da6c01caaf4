package graft

import graft.dialect.PgDialect
import org.apache.spark.sql.functions._

class DialectSpec extends SparkSpec {
  import spark.implicits._

  test("ilike is case-insensitive LIKE") {
    val df = Seq("WAYFAIR INC", "wayfair.com", "target").toDF("s")
    val got = df.filter(PgDialect.ilike(col("s"), "%WayFair%")).as[String].collect()
    assert(got.toSet == Set("WAYFAIR INC", "wayfair.com"))
  }

  test("translateRegex rewrites PG word boundaries") {
    assert(PgDialect.translateRegex("^NATERA\\y") == "^NATERA\\b")
    assert(PgDialect.translateRegex("\\mfoo\\M") == "\\bfoo\\b")
  }

  test("pgRegexMatch: \\y behaves as word boundary after translation") {
    val df = Seq("NATERA 123", "NATERAX", "natera co").toDF("s")
    val got = df.filter(PgDialect.pgRegexMatch(col("s"), "^NATERA\\y")).as[String].collect()
    assert(got.toSet == Set("NATERA 123", "natera co"))
  }

  test("regexpReplaceFirst replaces only the first occurrence") {
    val df = Seq("aXbXc").toDF("s")
    val got = df.select(PgDialect.regexpReplaceFirst(col("s"), "X", "-")).as[String].head()
    assert(got == "a-bXc")
  }

  test("regexpReplaceFirst honors the 'i' flag and PG-style backrefs") {
    val df = Seq("Foo bar foo").toDF("s")
    val got = df.select(
      PgDialect.regexpReplaceFirst(col("s"), "(foo)", "<\\1>", "i")).as[String].head()
    assert(got == "<Foo> bar foo")
  }

  test("regexpReplaceFirst treats '$' in the replacement as a literal (PG)") {
    val df = Seq("price 12 usd").toDF("s")
    val got = df.select(
      PgDialect.regexpReplaceFirst(col("s"), "([0-9]+) usd", "$\\1", "")).as[String].head()
    assert(got == "price $12")
  }

  test("anchored patterns: replace-all equals replace-first (SURVEY §4 note)") {
    // The reference's three 6-arg regexp_replace calls use ^-anchored
    // patterns, where replace-first and replace-all coincide — documented
    // equivalence, verified here.
    val df = Seq("SQ *CAFE SQ *TWICE", "plain").toDF("s")
    val rows = df.select(
      PgDialect.regexpReplaceFirst(col("s"), "^SQ \\*", "", "i").as("first"),
      regexp_replace(col("s"), "(?i)^SQ \\*", "").as("all")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("left/right/position match PG semantics") {
    val df = Seq(("venmo payment", "pay")).toDF("s", "needle")
    val row = df.select(
      PgDialect.leftStr(col("s"), 5),
      PgDialect.rightStr(col("s"), 7),
      PgDialect.positionIn(col("needle"), col("s"))).head()
    assert(row.getString(0) == "venmo")
    assert(row.getString(1) == "payment")
    assert(row.getInt(2) == 7)
  }

  test("translateRegex maps POSIX named classes to Java classes") {
    assert(PgDialect.translateRegex("^[[:digit:]]{3}[[:alpha:]]+$")
      == "^[\\p{Digit}]{3}[\\p{Alpha}]+$")
    val df = Seq("123abc", "12abc", "123 abc").toDF("s")
    val got = df.filter(PgDialect.pgRegexMatch(col("s"),
      "^[[:digit:]]{3}[[:alpha:]]+$")).as[String].collect()
    assert(got.toSeq == Seq("123abc"))
    // [[:space:]] inside a larger class
    val ws = Seq("a b", "a_b").toDF("s")
      .filter(PgDialect.pgRegexMatch(col("s"), "a[[:space:]]b"))
      .as[String].collect()
    assert(ws.toSeq == Seq("a b"))
  }
}
