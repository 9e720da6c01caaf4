package graft.models

import graft.dialect.PgDialect
import graft.operators.{RegexBank, TopPerGroup}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Spend-analytics family — the Spark re-expression of the reference card
  * pipeline (reference models/card_transactions_model.sql,
  * card_merchants_model.sql, classified_card_transactions.sql). The dataflow
  * (filter Sales → normalize descriptions → priority regex match → name
  * fallback → dimension joins → defaults → venmo/bank-transfer arms → UNION
  * distinct) is preserved; the rule content lives in seed tables (broadcast),
  * not in a 600-branch literal CASE — the end-state the reference itself
  * moved to (classified_card_transactions.sql vs the legacy
  * card_merchants_model.sql).
  */
object CardModels {

  /** P3 `clean_type` derivation (reference card_transactions_model.sql:6-15;
    * variant patterns added by classified_card_transactions.sql:18,24 are
    * passed in by the caller).
    */
  def cleanType(tpe: Column, cardLast4: Column, desc: Column,
      paymentCards: Seq[Int] = Seq(3221, 4245, 5083, 6823),
      extraPaymentPatterns: Seq[String] = Nil): Column = {
    val basePatterns = Seq("%payment thank you%", "%autopay%", "%online pymt%")
    val pats = basePatterns ++ extraPaymentPatterns
    val descIsPayment = pats.map(p => PgDialect.ilike(desc, p)).reduce(_ || _)
    when(tpe.isNotNull && length(trim(tpe)) > 0, tpe)
      .when(cardLast4.isin(paymentCards: _*), lit("Payment"))
      .when(descIsPayment, lit("Payment"))
      .otherwise(lit("Sale"))
  }

  /** U1: inline literal card dimension (reference card_names_model.sql:1-7). */
  def cardNames(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (3206, "blue_cash"), (9155, "gold_card"),
      (3221, "checking"), (4245, "savings"))
      .toDF("card_last4", "card_name")
  }

  /** Cleaned transactions (reference card_transactions_model.sql): derive
    * clean_type, drop payment-card rows, presentation order.
    */
  def cardTransactionsModel(tx: DataFrame): DataFrame =
    tx.withColumn("clean_type",
        cleanType(col("type"), col("card_last4"), col("description")))
      .filter(!col("card_last4").isin(3221, 4245, 5083, 6823))
      .select(col("key"), col("date"), col("amount"), col("card_last4"),
        col("description"), col("category"), col("clean_type"))
      .orderBy(col("date").desc_nulls_last, col("key"))

  /** Spend per merchant with grand-total share (reference
    * card_merchants_model.sql:621-639 — A1 + W1 over the classified output).
    * The classifier input is any frame with (merchant_name, amount).
    */
  def merchantSpendShare(classified: DataFrame): DataFrame = {
    val agg = classified
      .groupBy(col("merchant_name"))
      .agg(sum(col("amount").cast(DecimalType(18, 2))).as("spend_dec"))
    agg
      .withColumn("total_dec", sum(col("spend_dec")).over(Window.partitionBy()))
      .select(
        col("merchant_name"),
        col("spend_dec").cast("double").as("total_spend"),
        (col("spend_dec").cast("double") / col("total_dec").cast("double"))
          .as("percent_spend"))
  }

  /** The 6 normalized description variants the regex bank probes (reference
    * classified_card_transactions.sql:34-116 builds 8; the variants here:
    * raw, entity-decoded, aggregator-prefix-stripped, no-digits, collapsed
    * whitespace, lowercase). First-occurrence replaces use the custom
    * expression where PG used the 'g'-less form.
    */
  def normalizedVariants(desc: Column): Column = {
    val entity = replace(desc, lit("&amp;"), lit("&"))
    // Aggregator prefixes: SQ *, TST*, PY *, EB , SumUp, Zettle_* — strip
    // once at the start (PG used first-occurrence regexp_replace,
    // classified_card_transactions.sql:85-87).
    val noAgg = PgDialect.regexpReplaceFirst(entity,
      "^(SQ \\*|TST\\*|PY \\*|EB |SumUp |Zettle_\\*?)", "", "i")
    val noDigits = regexp_replace(noAgg, "[0-9]+", " ")
    val squeezed = trim(regexp_replace(noDigits, " +", " "))
    array_distinct(array(
      desc, entity, noAgg, squeezed, lower(desc), lower(squeezed)))
  }

  /** Best regex-rule key across all variants, with the reference's runtime
    * demotion of generic keys (classified_card_transactions.sql:141-144:
    * restaurants_misc/unknown/misc at priority −100000).
    */
  def regexRuleMatch(rules: Seq[RegexBank.Rule], demoted: Set[String])(
      variants: Column): Column = {
    val adjusted = rules.map { r =>
      if (demoted.contains(r.key)) r.copy(priority = r.priority - 100000) else r
    }
    val bank = new RegexBank.CompiledBank(adjusted, caseInsensitive = true)
    val f = udf { (vs: Seq[String]) =>
      if (vs == null) None
      else vs.iterator.map(bank.bestKey).collectFirst { case k if k != null => k }
    }
    f(variants)
  }

  /** Name-containment fallback (reference
    * classified_card_transactions.sql:152-184): longest merchant name (≥4
    * chars, generic names stop-listed) contained in any variant; name
    * variants include parenthetical-stripped and no-space forms.
    */
  def nameFallbackMatch(merchants: Seq[(String, String)],
      stopList: Set[String])(variants: Column): Column = {
    val prepared: Array[(String, Array[String])] = merchants
      .filter { case (_, name) => name != null && name.length >= 4 }
      .filterNot { case (_, name) => stopList.contains(name.toLowerCase) }
      .map { case (key, name) =>
        val base = name.toLowerCase.trim
        val noParen = base.replaceAll("\\s*\\(.*\\)$", "").trim
        val noSpace = noParen.replace(" ", "")
        (key, Array(base, noParen, noSpace).distinct.filter(_.length >= 4))
      }
      .sortBy { case (key, vs) => (-vs.map(_.length).max, key) }
      .toArray
    val f = udf { (vs: Seq[String]) =>
      if (vs == null) None
      else {
        val lowered = vs.filter(_ != null).map(_.toLowerCase)
        prepared.collectFirst {
          case (key, names) if names.exists(n => lowered.exists(_.contains(n))) => key
        }
      }
    }
    f(variants)
  }

  /** W3 window dedup of the merchant→account map (reference
    * classified_card_transactions.sql:205-221): one row per merchant by
    * (is_default desc, effective_from desc nulls last, account_id desc).
    */
  def mapOne(merchantAccountMap: DataFrame): DataFrame =
    TopPerGroup.top1(merchantAccountMap,
      Seq(col("merchant_key")),
      Seq(col("is_default").desc,
        col("effective_from").desc_nulls_last,
        col("account_id").desc))

  /** Full classification pipeline (reference
    * classified_card_transactions.sql). Seeds are small: regex rules and
    * merchant names ride broadcast inside the matcher closures; the account
    * dimensions join with explicit broadcast hints.
    */
  def classifiedCardTransactions(
      tx: DataFrame,
      merchantRegex: Seq[RegexBank.Rule],
      merchants: DataFrame,
      merchantAccountMap: DataFrame,
      accountsLeaf: DataFrame,
      merchantNameList: Seq[(String, String)],
      nameStopList: Set[String] = Set("market", "store", "online", "restaurant"),
      demotedKeys: Set[String] = Set("restaurants_misc", "unknown", "misc")): DataFrame = {

    // base: Sales only, card rows, non-venmo (venmo handled by its own arm).
    // The upstream `category` is renamed so the accounts_leaf `category`
    // wins in the enriched output (as in the reference's final projection).
    val typed = tx
      .withColumnRenamed("category", "raw_category")
      .withColumn("clean_type",
        cleanType(col("type"), col("card_last4"), col("description"),
          extraPaymentPatterns = Seq("%online payment%", "%payment thank you - web%")))
    val base = typed
      .filter(col("clean_type") === "Sale")
      .filter(PgDialect.leftStr(lower(col("description")), 5) =!= "venmo")

    val norm = base.withColumn("variants", normalizedVariants(col("description")))

    val matched = norm
      .withColumn("regex_key", regexRuleMatch(merchantRegex, demotedKeys)(col("variants")))
      .withColumn("name_key",
        nameFallbackMatch(merchantNameList, nameStopList)(col("variants")))
      // A demoted (generic) regex hit loses to the name fallback but still
      // beats 'unknown' (reference merchant_resolved coalesce order,
      // classified_card_transactions.sql:188-193).
      .withColumn("merchant_key",
        when(col("regex_key").isNotNull
            && !col("regex_key").isin(demotedKeys.toSeq: _*), col("regex_key"))
          .otherwise(coalesce(col("name_key"), col("regex_key"), lit("unknown"))))

    val enriched = matched
      .join(broadcast(merchants), Seq("merchant_key"), "left")
      .join(broadcast(mapOne(merchantAccountMap).select("merchant_key", "account_id")),
        Seq("merchant_key"), "left")
      .join(broadcast(accountsLeaf), Seq("account_id"), "left")

    val cardArm = enriched.select(
      col("key"), col("date"),
      col("amount").cast(DecimalType(18, 2)).as("amount"),
      col("description"),
      col("merchant_key"),
      coalesce(col("merchant_name"), lit("Unknown")).as("merchant_name"),
      coalesce(col("account_id"), lit("acct_unknown")).as("account_id"),
      coalesce(col("category"), lit("Uncategorized")).as("category"),
      coalesce(col("subcategory"), lit("Uncategorized")).as("subcategory"),
      lit("card").as("arm"))

    // venmo arm (reference :269-318): counterparty from intermediate_key.
    val venmo = typed
      .filter(col("clean_type") === "Sale")
      .filter(PgDialect.leftStr(lower(col("description")), 5) === "venmo")
      .select(
        col("key"), col("date"),
        col("amount").cast(DecimalType(18, 2)).as("amount"),
        col("description"),
        lit("venmo").as("merchant_key"),
        coalesce(col("intermediate_key"), lit("Venmo")).as("merchant_name"),
        lit("acct_venmo").as("account_id"),
        lit("Transfers").as("category"),
        lit("Venmo").as("subcategory"),
        lit("venmo").as("arm"))

    // bank-transfer arm (reference :322-364): Payment rows, sign-classified.
    val bank = typed
      .filter(col("clean_type") === "Payment")
      .select(
        col("key"), col("date"),
        col("amount").cast(DecimalType(18, 2)).as("amount"),
        col("description"),
        lit("bank_transfer").as("merchant_key"),
        when(col("amount") < 0, lit("Inbound Transfer"))
          .otherwise(lit("Outbound Transfer")).as("merchant_name"),
        lit("acct_transfer").as("account_id"),
        lit("Transfers").as("category"),
        lit("Bank").as("subcategory"),
        lit("bank").as("arm"))

    // UNION (distinct) across arms, PG semantics (reference :267,320) —
    // dedup over every column.
    cardArm.union(venmo).union(bank).distinct()
      .orderBy(col("date").desc_nulls_last, col("key").asc)
  }
}
