package graft

import graft.models.ReferencePipeline
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Date
import java.time.LocalDate

class ReferencePipelineSpec extends SparkSpec {
  import spark.implicits._

  def d(s: String): Date = Date.valueOf(s)
  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name.csv").getPath

  lazy val seeds: Map[String, DataFrame] = Map(
    "accounts_leaf" -> Tables.loadSeedCsv(spark, fixture("accounts_leaf"),
      ReferencePipeline.accountsLeafSchema),
    "merchant_regex" -> Tables.loadSeedCsv(spark, fixture("merchant_regex"),
      ReferencePipeline.merchantRegexSchema),
    "merchants" -> Tables.loadSeedCsv(spark, fixture("merchants"),
      ReferencePipeline.merchantsSchema),
    "merchant_account_map" -> Tables.loadSeedCsv(spark, fixture("merchant_account_map"),
      ReferencePipeline.merchantAccountMapSchema))

  // Sale rows carry a card from the 4-card NOT IN list (3221/4245/5083/6823)
  // with a null type: the reference's end-state clean_type CASE
  // (classified_card_transactions.sql:15-27) marks null-type rows on OTHER
  // cards as 'Payment'.
  lazy val cardTransactions: DataFrame = Seq(
    // key, date, amount, card_last4, description, category, type, intermediate_key
    ("t1", d("2022-01-10"), BigDecimal("120.00"), 3221, "WF WAYFAIR 12345", null, null, null),
    ("t1", d("2022-01-10"), BigDecimal("120.00"), 3221, "WF WAYFAIR 12345", null, null, null), // dup row
    ("t2", d("2022-01-11"), BigDecimal("6.50"), 3221, "BLUE BOTTLE COFFEE SHOP", null, null, null),
    ("t3", d("2022-01-12"), BigDecimal("250.00"), 4245, "NATERA 555", null, null, null),
    ("t4", d("2022-01-13"), BigDecimal("99.00"), 4245, "NATERAX LLC", null, null, null),
    ("t5", d("2022-01-14"), BigDecimal("20.00"), 3206, "venmo payment 123", null, null, "alice"),
    ("t6", d("2022-01-15"), BigDecimal("500.00"), 3206, "Online Transfer from Lorna", null, null, null),
    ("t7", d("2022-01-15"), BigDecimal("-75.00"), 9155, "Lorna transfer out", null, null, null),
    ("t8", d("2022-01-16"), BigDecimal("45.00"), 3221, "JOES GRILL", null, null, null),
    ("t9", d("2022-01-17"), BigDecimal("7.77"), 3221, "ZZZZ 123", null, null, null),
    ("t10", d("2022-01-18"), BigDecimal("30.00"), 3221, "SQ *NATERA 77", null, null, null),
    ("t11", d("2022-01-19"), BigDecimal("410.00"), 5083, "BRITISH A 321 LHR", null, null, null),
    ("t12", d("2022-01-20"), BigDecimal("80.00"), 6823, "venmo proto faff surplus seed fund", null, null, null))
    .toDF("key", "date", "amount", "card_last4", "description", "category",
      "type", "intermediate_key")

  lazy val sources: Map[String, DataFrame] = seeds ++ Map(
    "card_transactions" -> cardTransactions,
    "exercise_log" -> Seq(
      (d("2022-01-05"), "Treadmill", "Cardio", "", Some(3.0), Some(300.0), Some(30.0), None: Option[Double], None: Option[Double]),
      (d("2022-01-05"), "Bench Press", "Weights", "Chest, Arms", None, None, None, Some(10.0), Some(3.0)),
      (d("2022-02-10"), "Squat", "Weights", "Legs", None, None, None, Some(5.0), Some(5.0)))
      .toDF("Date", "Exercise Label", "Type", "Target Areas", "Distance (mi)",
        "Calories", "Duration (min)", "Reps", "Sets"),
    "weights" -> Seq((d("2022-01-07"), 180.0), (d("2022-01-21"), 178.0),
      (d("2022-02-11"), 176.0)).toDF("Measurement Date", "Weight"),
    "recipe_log" -> Seq(
      (d("2022-01-08"), "Curry", "Onion, Garlic", BigDecimal("12.50")),
      (d("2022-02-12"), "Curry", "Onion, Ginger", BigDecimal("11.00")),
      (d("2022-02-12"), "Salad", "Lettuce, Tomato", BigDecimal("5.00")))
      .toDF("Date", "Dish", "Plants", "Cost"),
    "shopping_log" -> Seq(
      (d("2022-01-09"), "Onion", 3.0, BigDecimal("2.40")),
      (d("2022-02-13"), "Lettuce", 1.0, BigDecimal("1.10")))
      .toDF("Date", "Ingredient", "Quantity", "Price"))

  lazy val built: Map[String, DataFrame] =
    ReferencePipeline.runAll(spark, sources, LocalDate.parse("2022-03-15"))

  test("DAG builds all models (27 like the reference)") {
    val reg = ReferencePipeline.registry(LocalDate.parse("2022-03-15"))
    assert(reg.names.length == 27)
    assert(reg.topoOrder.length == 27)
  }

  /** Rows of the classified output keyed by their (possibly stripped)
    * description — the reference's final projection has no surrogate key.
    */
  def classifiedBy(desc: String): org.apache.spark.sql.Row =
    built("classified_card_transactions")
      .filter(col("description") === desc).head()

  test("classified: regex priority match with full account enrichment") {
    val t1 = classifiedBy("WF WAYFAIR 12345")
    assert(t1.getAs[String]("merchant_key") == "wayfair")
    assert(t1.getAs[String]("merchant_name") == "Wayfair")
    assert(t1.getAs[String]("account_id") == "acct_home") // mapOne picks is_default TRUE
    assert(t1.getAs[String]("category") == "Home")
    assert(t1.getAs[String]("subcategory") == "Furniture")
    assert(t1.getAs[String]("billing_model") == "one_off")
    assert(t1.getAs[String]("spend_nature") == "durable")
    assert(t1.getAs[String]("discretion") == "discretionary")
    assert(t1.getAs[Int]("gl_code") == 5100)
    assert(t1.getAs[String]("account_name") == "Home-Furniture")
    // typo account id must fail the accounts_leaf join exactly as in PG:
    // enrichment columns fall to 'Unknown', gl_code stays NULL
    val t3 = classifiedBy("NATERA 555")
    assert(t3.getAs[String]("merchant_key") == "natera")
    assert(t3.getAs[String]("account_id") == "acfct_0aedc981ef")
    assert(t3.getAs[String]("category") == "Unknown")
    assert(t3.isNullAt(t3.fieldIndex("gl_code")))
  }

  test("classified: non-null regex hit always beats the name fallback") {
    // 'COFFEE' hits the demoted generic 'misc' rule; the reference's
    // coalesce(rx, nf) keeps the regex key even though 'Blue Bottle
    // Coffee' would match by name (classified_card_transactions.sql:190)
    val t2 = classifiedBy("BLUE BOTTLE COFFEE SHOP")
    assert(t2.getAs[String]("merchant_key") == "misc")
    assert(t2.getAs[String]("merchant_name") == "Miscellaneous")
    // demoted restaurants_misc hit with no account mapping
    val t8 = classifiedBy("JOES GRILL")
    assert(t8.getAs[String]("merchant_key") == "restaurants_misc")
    assert(t8.getAs[String]("account_id") == "Unknown")
  }

  test("classified: high-priority rule on a later variant wins (bestKeyAny)") {
    // raw matches only '^SQ \*' (prio 10); desc_noagg matches '^NATERA\y'
    // (prio 208) — rule-major ranking must pick natera, not square_agg
    val t10 = classifiedBy("SQ *NATERA 77")
    assert(t10.getAs[String]("merchant_key") == "natera")
  }

  test("classified: alias variant feeds the regex bank") {
    val t11 = classifiedBy("BRITISH A 321 LHR")
    assert(t11.getAs[String]("merchant_key") == "british_air")
    assert(t11.getAs[String]("account_id") == "acct_flights")
    assert(t11.getAs[String]("account_name") == "Travel-Flights")
  }

  test("classified: no rule, no name → Unknown defaults, null gl_code") {
    val t9 = classifiedBy("ZZZZ 123")
    assert(t9.getAs[String]("merchant_key") == "Unknown")
    assert(t9.getAs[String]("merchant_name") == "Unknown")
    assert(t9.getAs[String]("account_id") == "Unknown")
    assert(t9.getAs[String]("category") == "Unknown")
    assert(t9.isNullAt(t9.fieldIndex("gl_code")))
  }

  test("classified: name fallback catches non-word-boundary variant") {
    val t4 = classifiedBy("NATERAX LLC")
    assert(t4.getAs[String]("merchant_key") == "natera")
  }

  test("classified: venmo arm strips prefix and maps counterparties") {
    val t5 = classifiedBy("payment 123") // right('venmo payment 123', len-6)
    assert(t5.getAs[String]("merchant_key") == "venmo")
    assert(t5.getAs[String]("merchant_name") == "Venmo")
    assert(t5.getAs[Int]("card_last4") == 0)
    assert(t5.getAs[String]("category") == "Personal Services") // 'alice' → else arm
    assert(t5.getAs[Int]("gl_code") == 6110)
    val t12 = classifiedBy("proto faff surplus seed fund")
    assert(t12.getAs[String]("category") == "Health & Wellness")
    assert(t12.getAs[String]("subcategory") == "Fertility")
    assert(t12.getAs[String]("account_id") == "acct_93cc197271")
    assert(t12.getAs[String]("account_name") == "Health—Fertility")
  }

  test("classified: bank arm sign-classifies the two transfer cards") {
    val t6 = classifiedBy("Online Transfer from Lorna")
    assert(t6.getAs[String]("merchant_key") == "bank_transfer")
    assert(t6.getAs[String]("category") == "Housing")
    assert(t6.getAs[String]("subcategory") == "Rent")
    assert(t6.getAs[String]("billing_model") == "subscription")
    assert(t6.getAs[String]("discretion") == "mandatory")
    assert(t6.getAs[Int]("gl_code") == 5010)
    val t7 = classifiedBy("Lorna transfer out")
    assert(t7.getAs[String]("category") == "Travel")
    assert(t7.getAs[String]("subcategory") == "Flights")
    assert(t7.getAs[String]("discretion") == "discretionary")
    assert(t7.getAs[String]("account_name") == "Travel—Flights")
  }

  test("classified: union dedups the duplicate row; payment rows excluded") {
    val cc = built("classified_card_transactions")
    assert(cc.filter(col("description") === "WF WAYFAIR 12345").count() == 1)
    // t5's raw venmo row must not ALSO appear via the card arm
    assert(cc.filter(col("description").startsWith("venmo")).count() == 0)
  }

  test("card_transactions_model keeps all rows and derives clean_type") {
    val m = built("card_transactions_model")
    assert(m.count() == cardTransactions.count())
    val byKey = m.select("key", "clean_type").as[(String, String)]
      .collect().toMap
    assert(byKey("t1") == "Sale")     // 3221 + null type + plain desc
    assert(byKey("t5") == "Payment")  // 3206 not in the 4-card list
    assert(byKey("t6") == "Payment")
    assert(byKey("t12") == "Sale")    // 6823 in list, desc not payment-like
  }

  test("merchant spend share sums to 1") {
    val total = built("card_merchants_model")
      .agg(sum(col("percent_spend"))).as[Double].head()
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("metrics_month: spine rows and hand-computed January values") {
    val m = built("metrics_month").orderBy("period_start")
    val rows = m.collect()
    assert(rows.length == 3) // Jan, Feb, Mar <= asOf 2022-03-15
    val jan = m.filter(col("period_start") === d("2022-01-01")).head()
    def g[T](n: String): T = jan.getAs[T](n)
    assert(g[Long]("workout_days") == 1L)
    assert(g[Long]("treadmill_runs") == 1L)
    assert(g[Double]("treadmill_miles") == 3.0)
    assert(g[Double]("cardio_calories") == 300.0)
    assert(g[Double]("strength_reps") == 30.0)
    assert(g[Long]("weigh_ins") == 2L)
    assert(g[Double]("avg_weight") == 179.0)
    assert(g[Long]("dishes_cooked") == 1L)
    assert(g[Long]("new_dishes") == 1L)
    assert(g[Double]("recipe_cost") == 12.5)
    assert(g[Long]("distinct_plants") == 2L)
    assert(g[Long]("distinct_ingredients") == 1L)
    val feb = m.filter(col("period_start") === d("2022-02-01")).head()
    assert(feb.getAs[Long]("new_dishes") == 1L)    // Salad
    assert(feb.getAs[Long]("repeat_dishes") == 1L) // Curry
    assert(feb.getAs[Long]("distinct_plants") == 4L)
    val mar = m.filter(col("period_start") === d("2022-03-01")).head()
    assert(mar.isNullAt(mar.fieldIndex("workout_days"))) // empty period → nulls
  }

  test("metrics_week: ISO-week golden values for the week of 2022-01-03") {
    val w = built("metrics_week")
      .filter(col("period_start") === d("2022-01-03")).head()
    assert(w.getAs[Long]("workout_days") == 1L)   // Jan 5 (both exercises)
    assert(w.getAs[Long]("weigh_ins") == 1L)      // Jan 7
    assert(w.getAs[Double]("avg_weight") == 180.0)
    assert(w.getAs[Long]("dishes_cooked") == 1L)  // Curry on Jan 8
    assert(w.getAs[Long]("new_dishes") == 1L)
    assert(w.getAs[Long]("distinct_ingredients") == 1L) // Onion on Jan 9
    // spine: Mondays from 2022-01-03 through asOf 2022-03-15 inclusive
    assert(built("metrics_week").count() == 11)
  }

  test("flatten: target areas explode with trim, Cardio excluded") {
    val f = built("exercise_log_flattened")
    assert(f.select("target_area").as[String].collect().toSet ==
      Set("Chest", "Arms", "Legs"))
  }

  test("entity rollups agree across representations") {
    val plantsM = built("plants_month")
      .filter(col("date_period") === d("2022-02-01"))
      .select("n_distinct").as[Long].head()
    assert(plantsM == 4L)
    val workoutsM = built("workouts_month")
      .filter(col("date_period") === d("2022-01-01"))
      .select("n_rows").as[Long].head()
    assert(workoutsM == 2L) // Chest, Arms (Bench Press flattened)
  }

  test("quarterly and yearly grains: hand-computed goldens") {
    val q1 = built("metrics_quarter")
      .filter(col("period_start") === d("2022-01-01")).head()
    assert(q1.getAs[Long]("workout_days") == 2L)      // Jan 5 + Feb 10
    assert(q1.getAs[Long]("dishes_cooked") == 3L)
    assert(q1.getAs[Double]("recipe_cost") == 28.5)
    assert(q1.getAs[Long]("distinct_plants") == 5L)   // Onion Garlic Ginger Lettuce Tomato
    val y = built("metrics_year")
      .filter(col("period_start") === d("2022-01-01")).head()
    assert(y.getAs[Long]("weigh_ins") == 3L)
    assert(y.getAs[Double]("avg_weight") == 178.0)
    val spendQ = built("spend_quarter")
      .filter(col("merchant_name") === "Wayfair").select("total_spend")
      .as[Double].head()
    assert(spendQ == 120.0)
  }

  test("card_names literal dimension matches the reference model rows") {
    val names = built("card_names").as[(Int, String, String)].collect()
      .map { case (c, b, n) => c -> (b, n) }.toMap
    assert(names == Map(
      3221 -> ("Chase", "Freedom"), 6823 -> ("Chase", "Prime"),
      4245 -> ("Chase", "Sapphire"), 5083 -> ("Wells Fargo", "Bilt")))
  }

  test("checkAll: schema tests over the built DAG are all green") {
    val report = ReferencePipeline.checkAll(built)
    val violations = report.filter(col("violations") > 0)
      .collect().map(_.toString).toSeq
    assert(violations.isEmpty, s"check violations: $violations")
    assert(report.count() == 11L)
  }

  test("spend rollup over classified output") {
    val s = built("spend_month")
      .filter(col("merchant_name") === "Wayfair")
      .select("total_spend").as[Double].head()
    assert(s == 120.0)
  }
}
