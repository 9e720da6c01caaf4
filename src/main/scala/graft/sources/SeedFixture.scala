package graft.sources

import org.apache.spark.sql.types._

/** Single-sourced seed content for the oracle-checked CSV-ingest query
  * (SURVEY §2.1 S2, the `dbt seed` analogue): the same rows render once as
  * CSV text (read back through `Tables.loadSeedCsv`) and once as a DuckDB
  * VALUES list, so the hash compare proves the ingest path's parse
  * semantics — header, explicit schema, empty-as-null, RFC-4180 quoting
  * (embedded commas/quotes, preserved padding), TRUE/FALSE booleans, DATE
  * typing — not just row counts.
  */
object SeedFixture {

  /** (merchant_key, account_id, is_default, effective_from, note) —
    * each Option.empty lands as an empty CSV field and a SQL NULL.
    */
  val rows: Seq[(String, String, Option[Boolean], Option[String], Option[String])] = Seq(
    ("wayfair", "acct_home", Some(true), Some("2021-03-15"), Some("plain")),
    ("natera", "acct_health", Some(false), None, Some("genetics, prenatal")),
    ("netflix", "acct_media", None, Some("2020-01-01"), Some("say \"hi\"")),
    ("shell", "acct_fuel", Some(true), Some("2019-07-04"), None),
    ("café sol", "acct_food", Some(false), None, Some(" padded ")))

  val schema: StructType = StructType(Seq(
    StructField("merchant_key", StringType),
    StructField("account_id", StringType),
    StructField("is_default", BooleanType),
    StructField("effective_from", DateType),
    StructField("note", StringType)))

  /** RFC-4180 field: quote when the value holds a comma, quote, newline, or
    * leading/trailing space; escape embedded quotes by doubling.
    */
  private def csvField(v: String): String =
    if (v.exists(c => c == ',' || c == '"' || c == '\n')
        || v.startsWith(" ") || v.endsWith(" "))
      "\"" + v.replace("\"", "\"\"") + "\""
    else v

  /** The seed as CSV text, dbt-style: header row, TRUE/FALSE booleans,
    * empty fields for nulls.
    */
  def csvText: String = {
    val header = schema.fields.map(_.name).mkString(",")
    val lines = rows.map { case (mk, acct, dflt, from, note) =>
      Seq(csvField(mk), csvField(acct),
        dflt.map(b => if (b) "TRUE" else "FALSE").getOrElse(""),
        from.getOrElse(""),
        note.map(csvField).getOrElse("")).mkString(",")
    }
    (header +: lines).mkString("\n") + "\n"
  }

  /** Write the CSV to a temp file and return its path. */
  def writeCsv(): String = {
    val f = java.nio.file.Files.createTempFile("graft_seed_", ".csv")
    java.nio.file.Files.write(f, csvText.getBytes("UTF-8"))
    f.toFile.deleteOnExit()
    f.toString
  }

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The same rows as a DuckDB VALUES relation. */
  def oracleValues: String = rows.map { case (mk, acct, dflt, from, note) =>
    val d = dflt.map(_.toString.toUpperCase).getOrElse("CAST(NULL AS BOOLEAN)")
    val f = from.map(x => s"DATE '$x'").getOrElse("CAST(NULL AS DATE)")
    val n = note.map(sq).getOrElse("CAST(NULL AS VARCHAR)")
    s"(${sq(mk)}, ${sq(acct)}, $d, $f, $n)"
  }.mkString(",\n    ")
}
