package graft.models

/** Deterministic health-domain fixtures + DuckDB oracles for the reference
  * metrics / entity-rollup families (reference models/metrics_monthly.sql,
  * plants_weekly.sql, workouts_yearly.sql, recipes_quarterly.sql), so the
  * reference DAG's health arm gets CORRECTNESS rows, not just unit specs.
  *
  * exercise_log / recipe_log / shopping_log derive from `orders` (disjoint
  * o_orderkey % 4 slices) and weights from `customer`. Every VALUE
  * expression is a single-sourced SQL snippet used verbatim by BOTH the
  * Spark fixture (spaced reference identifiers, backtick-quoted) and the
  * DuckDB oracle CTEs (plain aliases) — only aliases differ, so the two
  * engines cannot drift on data. All double measures are integer- or
  * half-valued (exact binary sums regardless of partitioning/order), money
  * goes through DECIMAL; dates come from make_date (identical in both
  * engines).
  */
object HealthFixture {

  val asOf = "2022-12-31"

  // ---------------------------------------------- shared value snippets

  // moduli coprime with the %4 source slicing, so sliced keys still cover
  // every month/day combination
  private def dateOf(key: String): String =
    s"make_date(2022, CAST(1 + ($key % 23) % 12 AS INTEGER), CAST(1 + $key % 27 AS INTEGER))"

  private val exLabel =
    "CASE CAST(o_orderkey % 5 AS INTEGER) WHEN 0 THEN 'Treadmill' WHEN 1 THEN 'Bench Press' WHEN 2 THEN 'Squat' WHEN 3 THEN 'Rowing' ELSE 'Pull Up' END"
  private val exType =
    "CASE CAST(o_orderkey % 5 AS INTEGER) WHEN 0 THEN 'Cardio' WHEN 3 THEN 'Cardio' WHEN 4 THEN 'Calisthenics' ELSE 'Weights' END"
  private val exAreas =
    "CASE CAST(o_orderkey % 5 AS INTEGER) WHEN 1 THEN 'Chest, Arms' WHEN 2 THEN 'Legs , Glutes' WHEN 4 THEN 'Back,Lats' ELSE '' END"
  private val exDist =
    "CASE WHEN o_orderkey % 5 IN (0, 3) THEN CAST(o_orderkey % 7 AS DOUBLE) * 0.5 END"
  private val exCal =
    "CASE WHEN o_orderkey % 5 IN (0, 3) THEN CAST(o_orderkey % 300 AS DOUBLE) END"
  private val exDur =
    "CASE WHEN o_orderkey % 5 IN (0, 3) THEN CAST(o_orderkey % 60 AS DOUBLE) END"
  private val exReps = "CAST(o_orderkey % 12 AS DOUBLE)"
  private val exSets = "CAST(1 + o_orderkey % 4 AS DOUBLE)"

  private val wtWeight = "CAST(140 + c_custkey % 60 AS DOUBLE)"

  private val rcDish = "'dish_' || CAST(o_orderkey % 40 AS VARCHAR(5))"
  private val rcPlants =
    "CASE CAST(o_orderkey % 6 AS INTEGER) WHEN 0 THEN 'Onion, Garlic' WHEN 1 THEN 'Onion,Ginger , Kale' WHEN 2 THEN 'Lettuce, Tomato' WHEN 3 THEN 'Pepper' WHEN 4 THEN 'Spinach,  Kale' ELSE '' END"
  private val money = "CAST(o_totalprice AS DECIMAL(18,2))"

  private val shIngredient = "'ing_' || CAST(o_orderkey % 30 AS VARCHAR(5))"
  private val shQuantity = "CAST(o_orderkey % 9 AS DOUBLE)"

  // -------------------------------------------------- Spark fixture SQL

  def exerciseSparkSql(ordersTable: String): String =
    s"""SELECT ${dateOf("o_orderkey")} AS `Date`, $exLabel AS `Exercise Label`,
       |  $exType AS `Type`, $exAreas AS `Target Areas`,
       |  $exDist AS `Distance (mi)`, $exCal AS `Calories`,
       |  $exDur AS `Duration (min)`, $exReps AS `Reps`, $exSets AS `Sets`
       |FROM $ordersTable WHERE o_orderkey % 4 = 0""".stripMargin

  def weightsSparkSql(customerTable: String): String =
    s"""SELECT ${dateOf("c_custkey")} AS `Measurement Date`, $wtWeight AS `Weight`
       |FROM $customerTable""".stripMargin

  def recipeSparkSql(ordersTable: String): String =
    s"""SELECT ${dateOf("o_orderkey")} AS `Date`, $rcDish AS `Dish`,
       |  $rcPlants AS `Plants`, $money AS `Cost`
       |FROM $ordersTable WHERE o_orderkey % 4 = 1""".stripMargin

  def shoppingSparkSql(ordersTable: String): String =
    s"""SELECT ${dateOf("o_orderkey")} AS `Date`, $shIngredient AS `Ingredient`,
       |  $shQuantity AS `Quantity`, $money AS `Price`
       |FROM $ordersTable WHERE o_orderkey % 4 = 2""".stripMargin

  // ------------------------------------------------- DuckDB oracle CTEs

  /** The four source logs as DuckDB CTE bodies (plain aliases). */
  private def logCtes: String =
    s"""ex_log AS (
       |  SELECT ${dateOf("o_orderkey")} AS dt, $exLabel AS label,
       |    $exType AS typ, $exAreas AS areas, $exDist AS dist,
       |    $exCal AS cal, $exDur AS dur, $exReps AS reps, $exSets AS sets
       |  FROM orders WHERE o_orderkey % 4 = 0
       |), wt_log AS (
       |  SELECT ${dateOf("c_custkey")} AS dt, $wtWeight AS wgt FROM customer
       |), rc_log AS (
       |  SELECT ${dateOf("o_orderkey")} AS dt, $rcDish AS dish,
       |    $rcPlants AS plants, $money AS cost
       |  FROM orders WHERE o_orderkey % 4 = 1
       |), sh_log AS (
       |  SELECT ${dateOf("o_orderkey")} AS dt, $shIngredient AS ing,
       |    $shQuantity AS qty, $money AS price
       |  FROM orders WHERE o_orderkey % 4 = 2
       |), rc_flat AS (
       |  SELECT dt, dish, trim(p) AS plant FROM (
       |    SELECT dt, dish, UNNEST(string_split(plants, ',')) AS p FROM rc_log)
       |  WHERE LENGTH(trim(p)) > 0
       |), ex_flat AS (
       |  SELECT dt, label, trim(a) AS area FROM (
       |    SELECT dt, label, UNNEST(string_split(areas, ',')) AS a
       |    FROM ex_log WHERE typ <> 'Cardio')
       |  WHERE LENGTH(trim(a)) > 0
       |)""".stripMargin

  /** The metrics family oracle, grain-parameterized exactly like the Spark
    * side (reference metrics_{weekly,monthly,quarterly,yearly}.sql differ
    * only in spine bounds/step, the `+ interval - 1 day` period_end, the
    * EXTRACT field, and the date_trunc argument — the compound-interval
    * endpoints are where grain bugs hide, so each grain gets its own
    * CORRECTNESS entry): grain spine ≤ asOf left-joined to the five
    * per-period aggregate blocks.
    */
  def metricsOracleSql(grain: String): String = {
    // (spine start, series end, step, period_end offset, EXTRACT field);
    // ends mirror HealthModels.spineFor: asOf +30d / +2mo / +6mo / +1y
    val (start, end, step, endOff, num) = grain match {
      case "week" =>
        ("2022-01-03", "2023-01-30", "INTERVAL 1 WEEK", "INTERVAL 6 DAY", "WEEK")
      case "month" =>
        ("2022-01-01", "2023-02-28", "INTERVAL 1 MONTH", "INTERVAL 1 MONTH - INTERVAL 1 DAY", "MONTH")
      case "quarter" =>
        ("2022-01-01", "2023-06-30", "INTERVAL 3 MONTH", "INTERVAL 3 MONTH - INTERVAL 1 DAY", "QUARTER")
      case "year" =>
        ("2022-01-01", "2023-12-31", "INTERVAL 1 YEAR", "INTERVAL 1 YEAR - INTERVAL 1 DAY", "YEAR")
      case g => throw new IllegalArgumentException(s"no metrics grain: $g")
    }
    s"""WITH $logCtes, spine AS (
       |  SELECT CAST(UNNEST(generate_series(DATE '$start', DATE '$end', $step)) AS DATE) AS period_start
       |), spine2 AS (
       |  SELECT period_start,
       |    CAST(period_start + $endOff AS DATE) AS period_end,
       |    CAST(EXTRACT($num FROM period_start) AS BIGINT) AS period_num
       |  FROM spine WHERE period_start <= DATE '$asOf'
       |), ex AS (
       |  SELECT CAST(date_trunc('$grain', dt) AS DATE) AS period_start,
       |    COUNT(DISTINCT dt) AS workout_days,
       |    COUNT(CASE WHEN label = 'Treadmill' THEN 1 END) AS treadmill_runs,
       |    SUM(CASE WHEN label = 'Treadmill' THEN dist END) AS treadmill_miles,
       |    SUM(CASE WHEN typ = 'Cardio' THEN cal END) AS cardio_calories,
       |    SUM(CASE WHEN typ = 'Cardio' THEN dur END) AS cardio_minutes,
       |    SUM(CASE WHEN typ IN ('Weights', 'Calisthenics') THEN reps * sets END) AS strength_reps
       |  FROM ex_log GROUP BY 1
       |), wt AS (
       |  SELECT CAST(date_trunc('$grain', dt) AS DATE) AS period_start,
       |    COUNT(*) AS weigh_ins, AVG(wgt) AS avg_weight
       |  FROM wt_log GROUP BY 1
       |), flags AS (
       |  SELECT dt, dish,
       |    CASE WHEN dt = FIRST_VALUE(dt) OVER (PARTITION BY dish ORDER BY dt)
       |      THEN 'New' ELSE 'Repeat' END AS dish_flag
       |  FROM (SELECT DISTINCT dt, dish FROM rc_log)
       |), rc AS (
       |  SELECT CAST(date_trunc('$grain', r.dt) AS DATE) AS period_start,
       |    COUNT(*) AS dishes_cooked,
       |    COUNT(CASE WHEN f.dish_flag = 'New' THEN 1 END) AS new_dishes,
       |    COUNT(CASE WHEN f.dish_flag = 'Repeat' THEN 1 END) AS repeat_dishes,
       |    CAST(SUM(CAST(r.cost AS DECIMAL(18,2))) AS DOUBLE) AS recipe_cost
       |  FROM rc_log r JOIN flags f ON r.dt = f.dt AND r.dish = f.dish
       |  GROUP BY 1
       |), pl AS (
       |  SELECT CAST(date_trunc('$grain', dt) AS DATE) AS period_start,
       |    COUNT(DISTINCT plant) AS distinct_plants
       |  FROM rc_flat GROUP BY 1
       |), sh AS (
       |  SELECT CAST(date_trunc('$grain', dt) AS DATE) AS period_start,
       |    COUNT(DISTINCT ing) AS distinct_ingredients,
       |    SUM(qty) AS total_quantity,
       |    CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS shopping_cost
       |  FROM sh_log GROUP BY 1
       |)
       |SELECT s.period_start, s.period_end, s.period_num,
       |  ex.workout_days, ex.treadmill_runs, ex.treadmill_miles,
       |  ex.cardio_calories, ex.cardio_minutes, ex.strength_reps,
       |  wt.weigh_ins, wt.avg_weight,
       |  rc.dishes_cooked, rc.new_dishes, rc.repeat_dishes, rc.recipe_cost,
       |  pl.distinct_plants,
       |  sh.distinct_ingredients, sh.total_quantity, sh.shopping_cost
       |FROM spine2 s
       |LEFT JOIN ex USING (period_start)
       |LEFT JOIN wt USING (period_start)
       |LEFT JOIN rc USING (period_start)
       |LEFT JOIN pl USING (period_start)
       |LEFT JOIN sh USING (period_start)""".stripMargin
  }

  /** Entity-rollup family oracle, grain-parameterized like the Spark side
    * (reference {plants,workouts,recipes}_{weekly,monthly,quarterly,yearly}
    * .sql — 12 near-identical models differing only in the date_trunc
    * argument and source; every (family, grain) pair the reference ships
    * gets its own CORRECTNESS entry).
    */
  def entityOracleSql(family: String, grain: String): String = {
    val (cte, entity) = family match {
      case "plants"   => ("rc_flat", "plant")
      case "workouts" => ("ex_flat", "label")
      case "recipes"  => ("rc_log", "dish")
      case f => throw new IllegalArgumentException(s"no entity family: $f")
    }
    s"""WITH $logCtes
       |SELECT CAST(date_trunc('$grain', dt) AS DATE) AS date_period,
       |  COUNT(*) AS n_rows, COUNT(DISTINCT $entity) AS n_distinct
       |FROM $cte GROUP BY 1""".stripMargin
  }

  /** exercise_log_flattened oracle (reference
    * exercise_log_flattened.sql:1-13): non-Cardio rows, comma-split
    * Target Areas unnested/trimmed, empty fragments dropped — the FULL
    * column set this time (the logCtes ex_flat keeps only what the
    * rollups need), so the intermediate model gets its own CORRECTNESS
    * row instead of being checked only through its consumers.
    */
  def exerciseFlattenedOracleSql: String =
    s"""WITH $logCtes
       |SELECT dt AS "Date", label AS "Exercise Label", typ AS "Type",
       |  trim(a) AS target_area, reps AS "Reps", sets AS "Sets"
       |FROM (
       |  SELECT dt, label, typ, reps, sets,
       |    UNNEST(string_split(areas, ',')) AS a
       |  FROM ex_log WHERE typ <> 'Cardio')
       |WHERE LENGTH(trim(a)) > 0""".stripMargin

  /** recipe_log_flattened oracle (reference recipe_log_flattened.sql:1-12):
    * comma-split Plants unnested/trimmed with Dish and Cost carried
    * through; Cost reported as double (q32 decimal convention).
    */
  def recipeFlattenedOracleSql: String =
    s"""WITH $logCtes
       |SELECT dt AS "Date", dish AS "Dish", trim(p) AS plant,
       |  CAST(cost AS DOUBLE) AS "Cost"
       |FROM (
       |  SELECT dt, dish, cost, UNNEST(string_split(plants, ',')) AS p
       |  FROM rc_log)
       |WHERE LENGTH(trim(p)) > 0""".stripMargin

  /** plants_weekly oracle (reference plants_weekly.sql shape). */
  def plantsWeekOracleSql: String = entityOracleSql("plants", "week")

  /** workouts_yearly oracle (reference workouts_yearly.sql shape). */
  def workoutsYearOracleSql: String = entityOracleSql("workouts", "year")

  /** recipes_quarterly oracle (reference recipes_quarterly.sql shape). */
  def recipesQuarterOracleSql: String = entityOracleSql("recipes", "quarter")
}
