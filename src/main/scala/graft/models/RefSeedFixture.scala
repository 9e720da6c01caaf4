package graft.models

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Probe fixture for q41: the full reference seed content ([[RefSeeds]])
  * exercised rule by rule. One generated description per regex rule
  * ([[RegexProbe]] — 795/795 generate), every 5th merchant name as a
  * fallback probe, plus unclassifiable rows; rows are single-sourced into
  * the Spark frame and the DuckDB VALUES tx CTE. Probes that any
  * lookahead rule matches are dropped (the oracle's RE2 engine cannot run
  * those 5 rules — RefSeedSpec proves the remaining fixture classifies
  * identically with and without them, so omitting them from the oracle is
  * sound).
  */
object RefSeedFixture {

  final case class Probe(key: String, date: String, amount: BigDecimal,
      cardLast4: Int, description: String)

  private lazy val lookaheadPatterns: Seq[java.util.regex.Pattern] =
    RefSeeds.lookaheadRules.map { r =>
      java.util.regex.Pattern.compile(
        graft.dialect.PgDialect.translateRegex(r.pattern),
        java.util.regex.Pattern.CASE_INSENSITIVE)
    }

  /** True when any lookahead rule matches ANY of the forms the classifier
    * probes — the raw description is not enough, because the engine also
    * tries the normalized variants (a probe like "SQ AMAZON PRIME" misses
    * the rule raw but matches after the aggregator-prefix strip). Dropping
    * on every variant makes the oracle's lookahead-rule omission hold by
    * construction; RefSeedSpec's with/without-lookahead equality is the
    * backstop.
    */
  private def hitsLookahead(s: String): Boolean = {
    val forms = s +: CardModels.normVariantStrings(s)
    lookaheadPatterns.exists(p => forms.exists(f => p.matcher(f).find()))
  }

  /** Deterministic date/amount/card from the probe index. Cards cycle the
    * four non-Payment values only (3206/9155 would engage the bank arm);
    * amounts are strictly increasing so no two projected rows collide in
    * the arms' UNION DISTINCT.
    */
  private def row(i: Int, desc: String): Probe = {
    val date = java.time.LocalDate.of(2022, 1, 1).plusDays((i * 7) % 360)
    // strictly increasing cents → pairwise-distinct amounts, so no two
    // projected rows can collapse in the arms' UNION DISTINCT
    val cents = 10000L + i * 101L
    val amount = BigDecimal(java.math.BigDecimal.valueOf(cents, 2))
    val card = Seq(3221, 4245, 5083, 6823)(i % 4)
    Probe(f"p$i%04d", date.toString, amount, card, desc)
  }

  /** (probes, droppedForLookahead) */
  lazy val probesAndDropped: (Seq[Probe], Int) = {
    val ruleDescs = RefSeeds.rules.flatMap(r => RegexProbe.example(r.pattern))
    val nameDescs = RefSeeds.merchantSeed.zipWithIndex.collect {
      case ((_, name), i)
          if i % 5 == 0 && name.length >= 4 &&
            !CardModels.nameStopList.contains(
              name.replaceAll("[^A-Za-z0-9]+", " ").toLowerCase.trim) =>
        name
    }
    val unknown = Seq("XQZ 90210", "TOTALLY UNCLASSIFIABLE 1",
      "ZZZZ 41", "QQ 17 QQ", "NOPE NOPE 3")
    val all = ruleDescs ++ nameDescs ++ unknown
    val kept = all.filterNot(hitsLookahead)
    (kept.zipWithIndex.map { case (d, i) => row(i, d) },
      all.size - kept.size)
  }

  def probes: Seq[Probe] = probesAndDropped._1

  // ------------------------------------------------------- spark frame

  private val txSchema = StructType(Seq(
    StructField("key", StringType),
    StructField("date", DateType),
    StructField("amount", DecimalType(18, 2)),
    StructField("card_last4", IntegerType),
    StructField("description", StringType),
    StructField("category", StringType),
    StructField("type", StringType),
    StructField("intermediate_key", StringType)))

  def txDf(s: SparkSession): DataFrame = {
    val rows = probes.map { p =>
      Row(p.key, java.sql.Date.valueOf(p.date),
        p.amount.underlying.setScale(2), p.cardLast4, p.description,
        "probe", "Sale", null)
    }
    s.createDataFrame(
      s.sparkContext.parallelize(rows, 4), txSchema)
  }

  // ------------------------------------------------------- oracle SQL

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  private def txCte: String = {
    val vals = probes.map { p =>
      s"(${sq(p.key)}, DATE '${p.date}', CAST(${p.amount} AS DECIMAL(18,2)), " +
        s"${p.cardLast4}, ${sq(p.description)}, 'probe', 'Sale', CAST(NULL AS VARCHAR))"
    }.mkString(",\n    ")
    "SELECT * FROM (VALUES\n    " + vals +
      ") AS t(key, date, amount, card_last4, description, category, type, intermediate_key)"
  }

  /** Required-literal prefilter content for the oracle lateral: the SAME
    * literals the engine's CompiledBank extracts (lowercased, ASCII-only —
    * rules without one are checked unconditionally).
    */
  private def litPrefilter: (String, Seq[String]) = {
    val litRows = scala.collection.mutable.ArrayBuffer.empty[String]
    val always = scala.collection.mutable.ArrayBuffer.empty[String]
    RefSeeds.regexSeed
      .filterNot { case (_, _, p, _) => p.contains("(?!") || p.contains("(?=") }
      .foreach { case (rk, _, p, _) =>
        graft.operators.RegexBank.requiredLiterals(p) match {
          case Some(ls) if ls.forall(_.forall(_ < 128)) =>
            ls.foreach { l =>
              litRows += s"(${sq(rk)}, ${sq(l.toLowerCase(java.util.Locale.ROOT))})"
            }
          case _ => always += rk
        }
      }
    (litRows.mkString(",\n    "), always.toSeq)
  }

  /** q41 oracle: the parameterized classified CTE over the probe tx and
    * the full reference seeds, literal-prefiltered for RE2 throughput.
    */
  def classifiedOracleSql: String =
    CardOracle.classifiedCte(txCte, RefSeeds.regexValues,
      RefSeeds.merchantValues, RefSeeds.mapValues, RefSeeds.leafValues,
      Some(litPrefilter)) +
      """
        |SELECT date, CAST(amount AS DOUBLE) AS amount, card_last4, description,
        |  merchant_key, merchant_name, category, subcategory, billing_model,
        |  spend_nature, discretion, account_id, gl_code, account_name
        |FROM classified""".stripMargin

  /** q42 oracle: the reference spend_daily 10-key rollup over the
    * real-seed classified output (spend_daily.sql:2-12).
    */
  def spendDailyOracleSql: String =
    CardOracle.classifiedCte(txCte, RefSeeds.regexValues,
      RefSeeds.merchantValues, RefSeeds.mapValues, RefSeeds.leafValues,
      Some(litPrefilter)) +
      """
        |SELECT CAST(date_trunc('day', date) AS DATE) AS date_period,
        |  merchant_name, category, subcategory, billing_model, spend_nature,
        |  discretion, gl_code, account_name, account_id,
        |  CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM classified
        |GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10""".stripMargin
}
