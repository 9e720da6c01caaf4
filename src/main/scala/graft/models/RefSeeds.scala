package graft.models

import graft.operators.RegexBank

/** The reference project's REAL seed content (reference
  * seeds/merchant_regex.csv 795 rules, seeds/merchants.csv 635 names,
  * seeds/merchant_account_map.csv 617 mappings, seeds/accounts_leaf.csv 44
  * accounts), extracted verbatim as data resources — the same
  * content-as-data treatment the 532-branch legacy CASE got
  * (resources/graft/merchant_case.tsv). q41 runs the full classifier over
  * this content against a DuckDB oracle, so rule-content parity is
  * hash-checked, not just classifier capability (q11/q13) or the
  * synthetic-seed end state (q32).
  */
object RefSeeds {

  // ------------------------------------------------------------- parsing

  /** Minimal RFC-4180 parser (quoted fields hold commas and doubled
    * quotes — e.g. merchant_regex.csv:239, merchants.csv:329).
    */
  private[graft] def parseCsv(text: String): Seq[Array[String]] = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[Array[String]]
    val field = new StringBuilder
    val row = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0; var inQ = false
    def endField(): Unit = { row += field.toString; field.clear() }
    def endRow(): Unit = {
      if (row.nonEmpty || field.nonEmpty) { endField(); rows += row.toArray; row.clear() }
    }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < text.length && text.charAt(i + 1) == '"') { field.append('"'); i += 1 }
          else inQ = false
        } else field.append(c)
      } else c match {
        case '"' => inQ = true
        case ',' => endField()
        case '\r' => ()
        case '\n' => endRow()
        case other => field.append(other)
      }
      i += 1
    }
    endRow()
    rows.toSeq
  }

  private def resource(name: String): Seq[Array[String]] = {
    val in = getClass.getResourceAsStream(s"/graft/refseeds/$name.csv")
    require(in != null, s"missing resource refseeds/$name.csv")
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    parseCsv(text).drop(1) // header
  }

  // ------------------------------------------------------------- content

  /** (regex_key, merchant_key, pattern, priority) — full reference bank. */
  lazy val regexSeed: Seq[(String, String, String, Int)] =
    resource("merchant_regex").map { r => (r(0), r(1), r(2), r(3).toInt) }

  lazy val rules: Seq[RegexBank.Rule] =
    regexSeed.map { case (_, k, p, pr) => RegexBank.Rule(k, p, pr) }

  /** (merchant_key, merchant_name). */
  lazy val merchantSeed: Seq[(String, String)] =
    resource("merchants").map { r => (r(0), r(1)) }

  /** (merchant_key, account_id, is_default, effective_from, effective_to)
    * — raw strings; empty = null (dbt agate behavior). The reference CSV
    * carries a stray duplicate header as a data row
    * (merchant_account_map.csv:526); it maps the key 'merchant_key',
    * which no rule or merchant references, so it is inert in the
    * reference database and dropped here.
    */
  lazy val mapSeed: Seq[(String, String, Option[String], Option[String], Option[String])] =
    resource("merchant_account_map")
      .filterNot(_.head == "merchant_key")
      .map { r =>
        def opt(s: String) = if (s.isEmpty) None else Some(s)
        (r(0), r(1), opt(r(2)), opt(r(3)), opt(r(4)))
      }

  /** accounts_leaf row: account_id, gl_code, account_name, category,
    * subcategory, billing_model, spend_nature, discretion, is_mandatory.
    */
  lazy val leafSeed: Seq[Array[String]] = resource("accounts_leaf")

  /** Rules whose pattern uses lookahead — PG and Java evaluate them, but
    * the DuckDB oracle's RE2 engine cannot. They stay in the ENGINE bank;
    * the oracle omits them, and the probe fixture proves none of them
    * matches any probe (so both banks behave identically on the fixture).
    * Their semantics are unit-tested directly in RefSeedSpec.
    */
  lazy val lookaheadRules: Seq[RegexBank.Rule] =
    rules.filter(r => r.pattern.contains("(?!") || r.pattern.contains("(?="))

  lazy val oracleRules: Seq[RegexBank.Rule] =
    rules.filterNot(r => r.pattern.contains("(?!") || r.pattern.contains("(?="))

  // ------------------------------------------------------- spark frames

  import org.apache.spark.sql.{DataFrame, SparkSession}

  def merchantsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    merchantSeed.toDF("merchant_key", "merchant_name")
  }

  def mapDf(s: SparkSession): DataFrame = {
    import s.implicits._
    mapSeed.map { case (k, a, d, f, t) =>
      (k, a, d.orNull, f.map(java.sql.Date.valueOf).orNull,
        t.map(java.sql.Date.valueOf).orNull)
    }.toDF("merchant_key", "account_id", "is_default", "effective_from",
      "effective_to")
  }

  def leafDf(s: SparkSession): DataFrame = {
    import s.implicits._
    leafSeed.map { r =>
      (r(0), r(1).toInt, r(2), r(3), r(4), r(5), r(6), r(7), r(8))
    }.toDF("account_id", "gl_code", "account_name", "category", "subcategory",
      "billing_model", "spend_nature", "discretion", "is_mandatory")
  }

  // ------------------------------------------------------- oracle VALUES

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Oracle-side regex VALUES: boundary-only translation
    * ([[graft.dialect.PgDialect.translateRegexBoundaries]] — `\y` → `\b`,
    * length-preserving so the lateral's `length(pattern_regex)` tie-break
    * is unchanged). POSIX named classes stay verbatim: RE2 reads
    * `[[:digit:]]` natively but rejects Java's `\p{Digit}` spelling the
    * full engine-side translation produces. Lookahead rules are omitted
    * (see [[lookaheadRules]]).
    */
  def regexValues: String = regexSeed
    .filterNot { case (_, _, p, _) => p.contains("(?!") || p.contains("(?=") }
    .map { case (rk, mk, p, pr) =>
      s"(${sq(rk)}, ${sq(mk)}, ${sq(graft.dialect.PgDialect.translateRegexBoundaries(p))}, $pr)"
    }.mkString(",\n    ")

  def merchantValues: String = merchantSeed.map { case (k, n) =>
    s"(${sq(k)}, ${sq(n)})"
  }.mkString(",\n    ")

  def mapValues: String = mapSeed.map { case (k, a, d, f, t) =>
    val dv = d.map(sq).getOrElse("CAST(NULL AS VARCHAR)")
    val fv = f.map(x => s"DATE '$x'").getOrElse("CAST(NULL AS DATE)")
    val tv = t.map(x => s"DATE '$x'").getOrElse("CAST(NULL AS DATE)")
    s"(${sq(k)}, ${sq(a)}, $dv, $fv, $tv)"
  }.mkString(",\n    ")

  def leafValues: String = leafSeed.map { r =>
    s"(${sq(r(0))}, ${r(1).toInt}, ${sq(r(2))}, ${sq(r(3))}, ${sq(r(4))}, " +
      s"${sq(r(5))}, ${sq(r(6))}, ${sq(r(7))}, ${sq(r(8))})"
  }.mkString(",\n    ")
}
