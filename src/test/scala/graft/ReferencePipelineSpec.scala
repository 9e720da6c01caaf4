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

  lazy val cardTransactions: DataFrame = Seq(
    // key, date, amount, card_last4, description, category, type, intermediate_key
    ("t1", d("2022-01-10"), BigDecimal("120.00"), 3206, "WF WAYFAIR 12345", null, null, null),
    ("t1", d("2022-01-10"), BigDecimal("120.00"), 3206, "WF WAYFAIR 12345", null, null, null), // dup row
    ("t2", d("2022-01-11"), BigDecimal("6.50"), 3206, "SQ *BLUE BOTTLE COFFEE 4242", null, null, null),
    ("t3", d("2022-01-12"), BigDecimal("250.00"), 9155, "NATERA 555", null, null, null),
    ("t4", d("2022-01-13"), BigDecimal("99.00"), 9155, "NATERAX LLC", null, null, null),
    ("t5", d("2022-01-14"), BigDecimal("20.00"), 3206, "venmo payment 123", null, null, "alice"),
    ("t6", d("2022-01-15"), BigDecimal("500.00"), 3221, "ONLINE PYMT CHASE", null, null, null),
    ("t8", d("2022-01-16"), BigDecimal("45.00"), 3206, "JOES GRILL", null, null, null),
    ("t9", d("2022-01-17"), BigDecimal("7.77"), 3206, "ZZZZ 123", null, null, null))
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

  test("classified: regex priority match with account enrichment") {
    val cc = built("classified_card_transactions")
      .select("key", "merchant_key", "merchant_name", "account_id", "category",
        "subcategory", "arm")
      .as[(String, String, String, String, String, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(cc("t1") == (("t1", "wayfair", "Wayfair", "acct_home", "Home", "Furniture", "card")))
    // typo account id must fail the accounts_leaf join exactly as in PG
    assert(cc("t3") == (("t3", "natera", "Natera", "acfct_0aedc981ef",
      "Uncategorized", "Uncategorized", "card")))
  }

  test("classified: demoted generic hit loses to name fallback") {
    val cc = built("classified_card_transactions")
    val t2 = cc.filter(col("key") === "t2")
      .select("merchant_key", "merchant_name", "account_id").head()
    assert(t2.getString(0) == "bluebottle")
    assert(t2.getString(1) == "Blue Bottle Coffee")
    assert(t2.getString(2) == "acct_dining")
    // no name containment → demoted regex key still used
    val t8 = cc.filter(col("key") === "t8").select("merchant_key").as[String].head()
    assert(t8 == "restaurants_misc")
  }

  test("classified: no rule, no name → unknown merchant with defaults") {
    val t9 = built("classified_card_transactions")
      .filter(col("key") === "t9")
      .select("merchant_key", "merchant_name", "account_id", "category")
      .head()
    assert(t9.getString(0) == "unknown")
    assert(t9.getString(1) == "Unknown")
    assert(t9.getString(2) == "acct_unknown")
    assert(t9.getString(3) == "Uncategorized")
  }

  test("classified: name fallback catches non-word-boundary variant") {
    val t4 = built("classified_card_transactions")
      .filter(col("key") === "t4").select("merchant_key").as[String].head()
    assert(t4 == "natera")
  }

  test("classified: venmo and bank arms, union dedups the duplicate row") {
    val cc = built("classified_card_transactions")
    assert(cc.filter(col("key") === "t1").count() == 1) // dup collapsed
    val t5 = cc.filter(col("key") === "t5")
      .select("arm", "merchant_name").as[(String, String)].head()
    assert(t5 == (("venmo", "alice")))
    val t6 = cc.filter(col("key") === "t6")
      .select("arm", "merchant_name").as[(String, String)].head()
    assert(t6 == (("bank", "Outbound Transfer")))
  }

  test("card_transactions_model drops payment cards and derives clean_type") {
    val m = built("card_transactions_model")
    assert(m.filter(col("card_last4") === 3221).count() == 0)
    assert(m.filter(col("clean_type") =!= "Sale").count() == 0)
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

  test("card_names literal dimension has the 4 expected rows") {
    val names = built("card_names").as[(Int, String)].collect().toMap
    assert(names == Map(3206 -> "blue_cash", 9155 -> "gold_card",
      3221 -> "checking", 4245 -> "savings"))
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
