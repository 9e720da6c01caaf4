package graft.models

import graft.operators.RegexBank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic card-shaped fixture + DuckDB oracle for the full-fidelity
  * `classified_card_transactions` model (reference
  * models/classified_card_transactions.sql) over the driver's TPC-H-ish
  * parquet, so the reference DAG's end-state model gets a real CORRECTNESS
  * row (not just unit specs).
  *
  * Design: `card_transactions` is synthesized from `orders` by a SQL text
  * that parses identically in Spark SQL and DuckDB ([[txSql]]) — 24
  * description templates exercising every classification path (aggregator
  * prefixes, HTML entities, hyphen/tail/alias variants, priority demotion,
  * variant-priority inversion, name fallback incl. no-space form, rule
  * ties, venmo counterparties, bank-transfer sign arms). The four seed
  * tables are single-sourced Scala values emitted BOTH as Spark DataFrames
  * and as DuckDB VALUES clauses, so the two engines can't drift. The oracle
  * itself ([[classifiedOracleSql]]) is a DuckDB translation of the
  * reference SQL — lateral regex ranking, lateral name fallback, window'd
  * map dedup, 14-column projection, 3-arm UNION — with ties broken by
  * merchant_key on BOTH sides (the reference's bare LIMIT 1 leaves ties to
  * the engine).
  *
  * Regex patterns are stored in the dialect shared by java.util.regex and
  * RE2 (`\b`, anchors, alternation — no `\y`, no backrefs); the `\y`
  * translation path is covered by DialectSpec/ReferencePipelineSpec.
  */
object CardFixture {

  // ------------------------------------------------------------ seeds

  /** merchant_regex seed: (regex_key, merchant_key, pattern, priority). */
  val regexSeed: Seq[(String, String, String, Int)] = Seq(
    ("rx01", "bluebottle", "^BLUE BOTTLE\\b", 100),
    ("rx02", "square_agg", "^SQ \\*", 20),
    ("rx03", "wayfair", "^WF WAYFAIR\\b", 210),
    ("rx04", "wayfair", "\\bWAYFAIR\\b", 205),
    ("rx05", "natera", "^NATERA\\b", 208),
    ("rx06", "netflix", "NETFLIX", 90),
    ("rx07", "amazon", "\\bAMZN\\b", 90),
    ("rx08", "british_air", "^BRITISH AIRWAYS\\b", 95),
    ("rx09", "hungrybear", "HUNGRY BEAR", 80),
    ("rx10", "wholefoods", "WHOLE ?FOODS|WHOLEFDS", 85),
    ("rx11", "restaurants_misc", "\\b(GRILL|CAFE|RESTAURANT|KITCHEN|DINER)\\b", 10),
    ("rx12", "misc", "\\b(STORE|ONLINE)\\b", 8),
    ("rx13", "cvs", "^CVS\\b", 90),
    ("rx14", "shell", "\\bSHELL\\b", 70),
    ("rx15", "spotify", "SPOTIFY", 90),
    ("rx16", "delta", "^DELTA AIR\\b", 95),
    ("rx17", "eventful", "DATAVILLE CONF", 85),
    ("rx18", "farmstand", "\\bGREEN FARMSTAND$", 85),
    ("rx19", "alpha_dup", "DUPTEST A", 50),   // same prio+length as rx20:
    ("rx20", "beta_dup", "UPTEST AB", 50),    // merchant_key tie-break
    ("rx21", "united", "^UNITED AIRLINES\\b", 95))

  val rules: Seq[RegexBank.Rule] =
    regexSeed.map { case (_, k, p, pr) => RegexBank.Rule(k, p, pr) }

  /** merchants seed: (merchant_key, merchant_name). */
  val merchantSeed: Seq[(String, String)] = Seq(
    ("bluebottle", "Blue Bottle Coffee"),
    ("wayfair", "Wayfair"),
    ("natera", "Natera"),
    ("wholefoods", "Whole Foods Market"),
    ("netflix", "Netflix"),
    ("amazon", "Amazon Marketplace"),
    ("british_air", "British Airways"),
    ("united", "United Airlines"),
    ("hungrybear", "The Hungry Bear"),
    ("laylas", "Laylas Kitchen (Square)"),   // unmapped: account falls to Unknown
    ("eventful", "Eventful Conf (Eventbrite)"),
    ("farmstand", "Green Farmstand (Zettle)"),
    ("cvs", "CVS Pharmacy"),
    ("shell", "Shell Oil"),
    ("spotify", "Spotify"),
    ("delta", "Delta Air Lines"),
    ("restaurants_misc", "Restaurants (misc)"),
    ("unknown", "Unknown Merchant"),
    ("misc", "Misc One-offs"),
    ("square_agg", "Square Aggregator"),
    ("grill", "Grill"),                      // stoplisted fallback name
    ("alpha_dup", "Duptest Alpha"),
    ("beta_dup", "Duptest Beta"))

  /** merchant_account_map seed:
    * (merchant_key, account_id, is_default, effective_from) — effective_to
    * always null. Includes multi-row merchants exercising every mapOne
    * ordering arm and one typo'd account_id that fails the leaf join.
    */
  val mapSeed: Seq[(String, String, Option[String], Option[String])] = Seq(
    ("bluebottle", "acct_dining", Some("TRUE"), None),
    ("square_agg", "acct_misc", Some("TRUE"), None),
    ("wayfair", "acct_home", Some("TRUE"), Some("2020-01-01")),
    ("wayfair", "acct_bad", Some("FALSE"), Some("2021-06-01")), // is_default loses
    ("natera", "acct_health", Some("TRUE"), None),
    ("netflix", "acct_stream", Some("TRUE"), Some("2021-01-01")), // later from wins
    ("netflix", "acct_shopping", Some("TRUE"), Some("2020-01-01")),
    ("amazon", "acct_shopping", Some("TRUE"), None),
    ("british_air", "acct_flights", Some("TRUE"), None),
    ("united", "acct_flights", Some("TRUE"), None),
    ("hungrybear", "acct_dining", None, None), // null is_default → coalesce TRUE
    ("wholefoods", "acct_groceries", Some("TRUE"), None),
    ("restaurants_misc", "acct_rest_misc", Some("TRUE"), None),
    ("misc", "acct_misc", Some("TRUE"), None),
    ("cvs", "acct_pharmacy", Some("TRUE"), None),
    ("shell", "acct_fuel", Some("TRUE"), None),
    ("spotify", "acct_music", Some("TRUE"), None),
    ("spotify", "acct_misc", Some("TRUE"), Some("2019-01-01")), // non-null from beats null (desc nulls last)
    ("delta", "acct_fligths_typo", Some("TRUE"), None), // leaf join fails → Unknowns
    ("eventful", "acct_events", Some("TRUE"), None),
    ("farmstand", "acct_market", Some("TRUE"), None),
    ("unknown", "acct_misc", Some("TRUE"), None),
    ("alpha_dup", "acct_misc", Some("TRUE"), None),
    ("beta_dup", "acct_misc", Some("TRUE"), None))

  /** accounts_leaf seed: (account_id, gl_code, account_name, category,
    * subcategory, billing_model, spend_nature, discretion, is_mandatory).
    */
  val leafSeed: Seq[(String, Int, String, String, String, String, String, String, String)] = Seq(
    ("acct_dining", 5400, "Food-Dining Out", "Food & Groceries", "Dining Out", "one_off", "consumption", "discretionary", "FALSE"),
    ("acct_groceries", 5110, "Food-Groceries", "Food & Groceries", "Groceries", "recurring", "consumption", "mandatory", "TRUE"),
    ("acct_home", 5200, "Home-Furniture", "Home", "Furniture", "one_off", "durable", "discretionary", "FALSE"),
    ("acct_health", 5550, "Health-Testing", "Health & Wellness", "Testing", "one_off", "consumption", "mandatory", "TRUE"),
    ("acct_stream", 5600, "Entertainment-Streaming", "Entertainment & Events", "Streaming", "subscription", "consumption", "discretionary", "FALSE"),
    ("acct_shopping", 5700, "Shopping-Online", "Shopping", "Online", "one_off", "consumption", "discretionary", "FALSE"),
    ("acct_flights", 5310, "Travel-Flights", "Travel", "Flights", "one_off", "consumption", "discretionary", "FALSE"),
    ("acct_pharmacy", 5560, "Health-Pharmacy", "Health & Wellness", "Pharmacy", "one_off", "consumption", "mandatory", "TRUE"),
    ("acct_fuel", 5800, "Auto-Fuel", "Auto", "Fuel", "recurring", "consumption", "mandatory", "TRUE"),
    ("acct_music", 5610, "Entertainment-Music", "Entertainment & Events", "Music", "subscription", "consumption", "discretionary", "FALSE"),
    ("acct_rest_misc", 5410, "Food-Restaurants Misc", "Food & Groceries", "Restaurants Misc", "one_off", "consumption", "discretionary", "FALSE"),
    ("acct_events", 5730, "Entertainment-Events", "Entertainment & Events", "Events", "one_off", "consumption", "discretionary", "FALSE"),
    ("acct_market", 5120, "Food-Farmers Market", "Food & Groceries", "Farmers Market", "one_off", "consumption", "discretionary", "FALSE"),
    ("acct_misc", 5999, "Misc-Other", "Misc", "Other", "one_off", "consumption", "discretionary", "FALSE"))

  // ---------------------------------------------- Spark-side seed frames

  def merchantsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    merchantSeed.toDF("merchant_key", "merchant_name")
  }

  /** The regex seed as a DataFrame (merchant_regex source shape the
    * ReferencePipeline registry expects). */
  def regexDf(s: SparkSession): DataFrame = {
    import s.implicits._
    regexSeed.toDF("regex_key", "merchant_key", "pattern_regex", "priority")
  }

  def mapDf(s: SparkSession): DataFrame = {
    import s.implicits._
    mapSeed.map { case (k, a, d, f) => (k, a, d.orNull, f.orNull, null: String) }
      .toDF("merchant_key", "account_id", "is_default", "effective_from",
        "effective_to")
      .withColumn("effective_from",
        org.apache.spark.sql.functions.col("effective_from").cast(DateType))
      .withColumn("effective_to",
        org.apache.spark.sql.functions.col("effective_to").cast(DateType))
  }

  def leafDf(s: SparkSession): DataFrame = {
    import s.implicits._
    leafSeed.toDF("account_id", "gl_code", "account_name", "category",
      "subcategory", "billing_model", "spend_nature", "discretion",
      "is_mandatory")
  }

  // ------------------------------------------------- shared fixture SQL

  /** card_transactions synthesized from `orders` — parses identically in
    * Spark SQL and DuckDB. 24 description templates; card cycle puts the
    * 4-card NOT-IN list on templates 0-3 mod 6 (null-type rows on other
    * cards are 'Payment' per the reference clean_type CASE); type='Sale'
    * every 5th key lets the remaining templates reach the card arm too.
    */
  def txSql(ordersTable: String): String =
    s"""SELECT
       |  CAST(o_orderkey AS VARCHAR(30)) AS key,
       |  o_orderdate AS date,
       |  CASE WHEN o_orderkey % 3 = 0 THEN -CAST(o_totalprice AS DECIMAL(18,2))
       |       ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS amount,
       |  CASE CAST(o_orderkey % 6 AS INTEGER) WHEN 0 THEN 3221 WHEN 1 THEN 4245
       |       WHEN 2 THEN 5083 WHEN 3 THEN 6823 WHEN 4 THEN 3206
       |       ELSE 9155 END AS card_last4,
       |  CASE CAST(o_orderkey % 24 AS INTEGER)
       |    WHEN 0 THEN 'SQ *BLUE BOTTLE COFFEE #' || CAST(o_orderkey % 7 AS VARCHAR(5))
       |    WHEN 1 THEN 'WF WAYFAIR ' || CAST(o_orderkey % 7 AS VARCHAR(5))
       |    WHEN 2 THEN 'NATERA GENETICS'
       |    WHEN 3 THEN 'NETFLIX.COM'
       |    WHEN 4 THEN 'BRITISH A 0' || CAST(o_orderkey % 7 AS VARCHAR(5))
       |    WHEN 5 THEN 'UA INFLT 8' || CAST(o_orderkey % 7 AS VARCHAR(5))
       |    WHEN 6 THEN 'TST* THE HUNGRY BEAR - CHI'
       |    WHEN 7 THEN 'WHOLEFDS &amp; CO 10' || CAST(o_orderkey % 7 AS VARCHAR(5))
       |    WHEN 8 THEN 'Zettle_*GREEN FARMSTAND, IL'
       |    WHEN 9 THEN 'EB DATAVILLE CONF, CA'
       |    WHEN 10 THEN 'LAYLASKITCHEN LLC'
       |    WHEN 11 THEN 'TST*LAYLASKITCHEN 0' || CAST(o_orderkey % 7 AS VARCHAR(5))
       |    WHEN 12 THEN 'CVS/PHARMACY #0' || CAST(o_orderkey % 7 AS VARCHAR(5))
       |    WHEN 13 THEN 'SHELL OIL 575757'
       |    WHEN 14 THEN 'SPOTIFY P0' || CAST(o_orderkey % 7 AS VARCHAR(5))
       |    WHEN 15 THEN 'DELTA AIR LINES ATL'
       |    WHEN 16 THEN 'THE GRILL HOUSE'
       |    WHEN 17 THEN 'MY ONLINE STORE 44'
       |    WHEN 18 THEN 'AMZN Mktp US'
       |    WHEN 19 THEN 'DUPTEST AB EXPO'
       |    WHEN 20 THEN 'venmo  dinner w friends 0' || CAST(o_orderkey % 7 AS VARCHAR(5))
       |    WHEN 21 THEN 'venmo proto faff surplus seed fund'
       |    WHEN 22 THEN 'Online Transfer from Lorna - 0' || CAST(o_orderkey % 7 AS VARCHAR(5))
       |    ELSE 'XQZ 9' || CAST(o_orderkey % 7 AS VARCHAR(5))
       |  END AS description,
       |  'cat' || CAST(o_orderkey % 3 AS VARCHAR(5)) AS category,
       |  CASE WHEN o_orderkey % 5 = 0 THEN 'Sale'
       |       WHEN o_orderkey % 5 = 4 THEN 'Refund'
       |       ELSE CAST(NULL AS VARCHAR(10)) END AS type,
       |  CASE CAST(o_orderkey % 4 AS INTEGER) WHEN 0 THEN 'Lorna Kerry'
       |       WHEN 1 THEN 'Lisa Raich' WHEN 2 THEN 'Sofia Mesa'
       |       ELSE CAST(NULL AS VARCHAR(20)) END AS intermediate_key
       |FROM $ordersTable""".stripMargin

  // ------------------------------------------------- DuckDB oracle SQL

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"

  private def regexValues: String = regexSeed.map { case (rk, mk, p, pr) =>
    s"(${sq(rk)}, ${sq(mk)}, ${sq(p)}, $pr)"
  }.mkString(",\n    ")

  private def merchantValues: String = merchantSeed.map { case (k, n) =>
    s"(${sq(k)}, ${sq(n)})"
  }.mkString(",\n    ")

  private def mapValues: String = mapSeed.map { case (k, a, d, f) =>
    val dv = d.map(sq).getOrElse("CAST(NULL AS VARCHAR)")
    val fv = f.map(x => s"DATE '$x'").getOrElse("CAST(NULL AS DATE)")
    s"(${sq(k)}, ${sq(a)}, $dv, $fv, CAST(NULL AS DATE))"
  }.mkString(",\n    ")

  private def leafValues: String = leafSeed.map {
    case (a, g, an, c, sc, bm, sn, di, im) =>
      s"(${sq(a)}, $g, ${sq(an)}, ${sq(c)}, ${sq(sc)}, ${sq(bm)}, ${sq(sn)}, ${sq(di)}, ${sq(im)})"
  }.mkString(",\n    ")

  /** The classification oracle as one DuckDB CTE chain ending in the
    * 14-column 3-arm UNION — a dialect translation of reference
    * classified_card_transactions.sql over [[txSql]] + the VALUES seeds.
    * Exposed without a final SELECT wrapper so q32/q33 can share it.
    */
  def classifiedCte: String =
    CardOracle.classifiedCte(txSql("orders"), regexValues, merchantValues,
      mapValues, leafValues)

  /** card_transactions_model oracle (reference
    * card_transactions_model.sql:1-24): projection with the LEGACY
    * clean_type CASE — null type on a card outside the 4-card payment
    * list is 'Payment'; description ILIKE patterns only decide rows
    * whose card IS in the list; everything else 'Sale'. Amount as
    * double (q32 decimal convention). The model's own CORRECTNESS row —
    * previously checked only transitively through q32/q41 consumers.
    */
  def txModelOracleSql: String = {
    val pats = Seq("%online transfer%", "%edward jones%", "%jpmorgan chase%",
      "%fedwire%", "%automatic payment%")
    val ilikes = pats.map(p => s"lower(description) LIKE '$p'").mkString("\n         OR ")
    s"""WITH tx AS (
       |${txSql("orders")}
       |)
       |SELECT key, date, CAST(amount AS DOUBLE) AS amount, card_last4,
       |  CASE WHEN type IS NOT NULL THEN type
       |       WHEN card_last4 NOT IN (3221, 4245, 5083, 6823) THEN 'Payment'
       |       WHEN $ilikes THEN 'Payment'
       |       ELSE 'Sale' END AS clean_type,
       |  description AS raw_description,
       |  category AS raw_category,
       |  type AS raw_type
       |FROM tx""".stripMargin
  }

  /** q32 oracle: the classified model, amount reported as double. */
  def classifiedOracleSql: String =
    classifiedCte +
      """
        |SELECT date, CAST(amount AS DOUBLE) AS amount, card_last4, description,
        |  merchant_key, merchant_name, category, subcategory, billing_model,
        |  spend_nature, discretion, account_id, gl_code, account_name
        |FROM classified""".stripMargin

  /** q33 oracle: the reference spend_daily rollup (spend_daily.sql:2-12) —
    * 10 group keys over the classified output, exact decimal spend sum.
    */
  def spendDailyOracleSql: String =
    classifiedCte +
      """
        |SELECT CAST(date_trunc('day', date) AS DATE) AS date_period,
        |  merchant_name, category, subcategory, billing_model, spend_nature,
        |  discretion, gl_code, account_name, account_id,
        |  CAST(SUM(CAST(amount AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |FROM classified
        |GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9, 10""".stripMargin
}
