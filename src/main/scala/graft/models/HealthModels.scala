package graft.models

import graft.core.Grain
import graft.operators.DateSpine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import java.time.LocalDate

/** Health/fitness analytics family — flattens, grain-parameterized metrics
  * and entity rollups (reference models/exercise_log_flattened.sql,
  * recipe_log_flattened.sql, metrics_{weekly,monthly,quarterly,yearly}.sql,
  * {recipes,plants,workouts}_*.sql — the 4 grain copies collapse to one
  * parameterized transformation each).
  */
object HealthModels {

  /** J7: comma-packed column → one row per element (reference
    * exercise_log_flattened.sql:6-7 `UNNEST(string_to_array(...))`), trimmed,
    * presentation order with explicit nulls-last (reference :12).
    */
  def exerciseLogFlattened(exerciseLog: DataFrame): DataFrame =
    exerciseLog
      .filter(col("Type") =!= "Cardio")
      .select(col("Date"), col("Exercise Label"), col("Type"),
        explode(split(col("Target Areas"), ",")).as("target_area_raw"),
        col("Reps"), col("Sets"))
      .withColumn("target_area", trim(col("target_area_raw")))
      .drop("target_area_raw")
      .filter(length(col("target_area")) > 0)
      .orderBy(col("Date").desc_nulls_last, col("Exercise Label").asc_nulls_last)

  /** Same flatten for recipes' plant lists (reference
    * recipe_log_flattened.sql:6-7).
    */
  def recipeLogFlattened(recipeLog: DataFrame): DataFrame =
    recipeLog
      .select(col("Date"), col("Dish"),
        explode(split(col("Plants"), ",")).as("plant_raw"),
        col("Cost"))
      .withColumn("plant", trim(col("plant_raw")))
      .drop("plant_raw")
      .filter(length(col("plant")) > 0)

  /** Entity-count rollup family (reference {recipes,plants,workouts}_*.sql):
    * count + distinct count of an entity per period, presentation-ordered.
    * Delegates to the generic [[graft.operators.Rollups.entityCounts]].
    */
  def entityRollup(df: DataFrame, dateCol: String, entityCol: String,
      grain: Grain): DataFrame =
    graft.operators.Rollups.entityCounts(df, col(dateCol), col(entityCol), grain)
      .orderBy(col("date_period").desc)

  /** Spine parameters per grain (reference metrics_*.sql:9: weekly starts
    * Monday 2022-01-03 +30 days past asOf; monthly 2022-01-01 +2 months;
    * quarterly +6 months; yearly +1 year).
    */
  def spineFor(spark: SparkSession, grain: Grain, asOf: LocalDate): DataFrame = {
    val (start, end) = grain match {
      case Grain.Week    => (LocalDate.parse("2022-01-03"), asOf.plusDays(30))
      case Grain.Month   => (LocalDate.parse("2022-01-01"), asOf.plusMonths(2))
      case Grain.Quarter => (LocalDate.parse("2022-01-01"), asOf.plusMonths(6))
      case Grain.Year    => (LocalDate.parse("2022-01-01"), asOf.plusYears(1))
      case Grain.Day     => (LocalDate.parse("2022-01-01"), asOf)
    }
    DateSpine.spine(spark, grain, start, end)
      .filter(col("period_start") <= lit(java.sql.Date.valueOf(asOf)))
  }

  /** The metrics family (reference metrics_{grain}.sql): a generated date
    * spine left-joined to five aggregate blocks. All five right sides are
    * per-period aggregates (small) → broadcast joins onto the spine.
    * `asOf` replaces the reference's non-deterministic `current_date`
    * (SURVEY §4 reproducibility note).
    */
  def metrics(spark: SparkSession, grain: Grain, asOf: LocalDate,
      exerciseLog: DataFrame, weights: DataFrame, recipeLog: DataFrame,
      recipeFlat: DataFrame, shoppingLog: DataFrame): DataFrame = {

    def periodOf(c: String): org.apache.spark.sql.Column =
      Grain.periodStart(col(c), grain).as("period_start")

    // exercise block (reference metrics_monthly.sql:13-27): distinct workout
    // days, treadmill runs (A4), conditional sums by type (A5).
    val ex = exerciseLog
      .groupBy(periodOf("Date"))
      .agg(
        countDistinct(col("Date")).as("workout_days"),
        count(when(col("Exercise Label") === "Treadmill", 1)).as("treadmill_runs"),
        sum(when(col("Exercise Label") === "Treadmill", col("Distance (mi)")))
          .as("treadmill_miles"),
        sum(when(col("Type") === "Cardio", col("Calories"))).as("cardio_calories"),
        sum(when(col("Type") === "Cardio", col("Duration (min)"))).as("cardio_minutes"),
        sum(when(col("Type").isin("Weights", "Calisthenics"), col("Reps") * col("Sets")))
          .as("strength_reps"))

    // weights block (reference :29-37): count + average.
    val wt = weights
      .groupBy(Grain.periodStart(col("Measurement Date"), grain).as("period_start"))
      .agg(count(lit(1)).as("weigh_ins"), avg(col("Weight")).as("avg_weight"))

    // recipe block (reference :39-75): W2 first-value New/Repeat flags on
    // distinct (Date, Dish), J2 composite join back for Cost, A6 FILTER
    // counts.
    val dishW = Window.partitionBy(col("Dish")).orderBy(col("Date"))
    val dishFlags = recipeLog.select(col("Date"), col("Dish")).distinct()
      .withColumn("first_date", first(col("Date")).over(dishW))
      .withColumn("dish_flag",
        when(col("Date") === col("first_date"), lit("New")).otherwise(lit("Repeat")))
    val rc = recipeLog
      .join(dishFlags.select("Date", "Dish", "dish_flag"), Seq("Date", "Dish"))
      .groupBy(periodOf("Date"))
      .agg(
        count(lit(1)).as("dishes_cooked"),
        count(when(col("dish_flag") === "New", 1)).as("new_dishes"),
        count(when(col("dish_flag") === "Repeat", 1)).as("repeat_dishes"),
        sum(col("Cost").cast(DecimalType(18, 2))).cast("double").as("recipe_cost"))

    // flattened-plants block (reference :66-75): distinct plants per period.
    val pl = recipeFlat
      .groupBy(periodOf("Date"))
      .agg(countDistinct(col("plant")).as("distinct_plants"))

    // shopping block (reference :77-86): distinct ingredients, sums.
    val sh = shoppingLog
      .groupBy(periodOf("Date"))
      .agg(
        countDistinct(col("Ingredient")).as("distinct_ingredients"),
        sum(col("Quantity")).as("total_quantity"),
        sum(col("Price").cast(DecimalType(18, 2))).cast("double").as("shopping_cost"))

    spineFor(spark, grain, asOf)
      .join(broadcast(ex), Seq("period_start"), "left")
      .join(broadcast(wt), Seq("period_start"), "left")
      .join(broadcast(rc), Seq("period_start"), "left")
      .join(broadcast(pl), Seq("period_start"), "left")
      .join(broadcast(sh), Seq("period_start"), "left")
      .orderBy(col("period_start").desc)
  }
}
