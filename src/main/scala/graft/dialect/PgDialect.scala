package graft.dialect

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The small Postgres-dialect kit (SURVEY §2.8). Column combinators over
  * codegen'd built-ins where possible — predicates stay pushdown-able and
  * inside whole-stage codegen; the one genuine gap (first-occurrence
  * regexp_replace) is a custom Expression in [[RegexpReplaceFirst]].
  */
object PgDialect {

  /** Postgres `ILIKE` (reference models/card_merchants_model.sql:7 — used
    * ~700×). Lower both sides; LIKE itself is codegen'd.
    */
  def ilike(c: Column, pattern: String): Column =
    lower(c).like(pattern.toLowerCase)

  /** Postgres `~*` (case-insensitive POSIX regex match, reference
    * models/classified_card_transactions.sql:139-144) with the dialect
    * translated for java.util.regex.
    */
  def pgRegexMatch(c: Column, pgPattern: String): Column =
    c.rlike("(?i)" + translateRegex(pgPattern))

  /** POSIX named classes → Java's US-ASCII `\p{...}` classes (both are
    * ASCII-scoped without extra flags, so semantics line up). The
    * bracket-expression form `[[:alpha:]]` becomes `[\p{Alpha}]`.
    */
  private val posixClasses: Seq[(String, String)] = Seq(
    "[:alpha:]" -> "\\p{Alpha}", "[:digit:]" -> "\\p{Digit}",
    "[:alnum:]" -> "\\p{Alnum}", "[:space:]" -> "\\s",
    "[:upper:]" -> "\\p{Upper}", "[:lower:]" -> "\\p{Lower}",
    "[:punct:]" -> "\\p{Punct}", "[:blank:]" -> "\\p{Blank}",
    "[:xdigit:]" -> "\\p{XDigit}", "[:cntrl:]" -> "\\p{Cntrl}",
    "[:graph:]" -> "\\p{Graph}", "[:print:]" -> "\\p{Print}")

  /** Translate a Postgres POSIX regex to java.util.regex dialect.
    * `\y` (PG word boundary — 84 patterns in reference
    * seeds/merchant_regex.csv, e.g. line 5 `^NATERA\y`) → Java `\b`;
    * `\m`/`\M` (begin/end-of-word) → `\b` as the closest Java equivalent;
    * POSIX named classes (`[[:digit:]]` etc.) → `\p{...}`.
    */
  def translateRegex(pg: String): String =
    posixClasses.foldLeft(translateRegexBoundaries(pg)) {
      case (s, (posix, java)) => s.replace(posix, java)
    }

  /** Boundary-only translation (`\y`/`\m`/`\M` → `\b`) — the
    * length-preserving subset safe for RE2 consumers (DuckDB oracles):
    * RE2 understands `\b` and POSIX `[[:digit:]]` classes natively but
    * NOT Java's `\p{Digit}` names, so POSIX classes must stay verbatim
    * there; and a same-length rewrite keeps `length(pattern_regex)`
    * tie-breaks identical across engines.
    */
  def translateRegexBoundaries(pg: String): String =
    pg.replace("\\y", "\\b").replace("\\m", "\\b").replace("\\M", "\\b")

  /** Postgres single-occurrence `regexp_replace(s, p, r)` (no 'g' flag) and
    * the 6-arg first-occurrence form (reference
    * models/classified_card_transactions.sql:85-87). Spark's built-in
    * regexp_replace replaces every match, so this is a custom Expression.
    * `flags` as in PG: 'i' for case-insensitive.
    */
  def regexpReplaceFirst(s: Column, pattern: String, replacement: String,
      flags: String = ""): Column = {
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    var p = translateRegex(pattern)
    if (flags.contains("i")) p = "(?i)" + p
    column(RegexpReplaceFirst(
      expression(s), expression(lit(p)), expression(lit(replacement))))
  }

  /** PG `left(s, n)` (reference classified_card_transactions.sql:265). */
  def leftStr(c: Column, n: Int): Column = substring(c, 1, n)

  /** PG `right(s, n)` (reference classified_card_transactions.sql:273). */
  def rightStr(c: Column, n: Int): Column =
    when(length(c) <= n, c).otherwise(substring(c, -n, n))

  /** PG `right(s, n)` with a COLUMN length, including PG's negative-n
    * semantics (reference classified_card_transactions.sql:271
    * `right(description, length(description)-6)`): n ≥ len → whole string;
    * 0 ≤ n < len → last n chars; n < 0 → drop the first |n| chars (so
    * right('venmo', -1) = 'enmo'). DuckDB's right() matches PG here, making
    * it a direct oracle.
    */
  def rightStrCol(c: Column, n: Column): Column =
    when(n >= length(c), c)
      .when(n >= 0, c.substr(length(c) - n + lit(1), n))
      .otherwise(c.substr(-n + lit(1), greatest(length(c) + n, lit(0))))

  /** PG `position(x in y)` (reference classified_card_transactions.sql:174-177)
    * — 1-based index, 0 when absent; column-vs-column capable.
    */
  def positionIn(needle: Column, hay: Column): Column =
    call_function("instr", hay, needle)
}
