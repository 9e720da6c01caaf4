package graft.models

import graft.dialect.PgDialect
import graft.operators.{RegexBank, TopPerGroup}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Spend-analytics family — the Spark re-expression of the reference card
  * pipeline (reference models/card_transactions_model.sql,
  * card_merchants_model.sql, classified_card_transactions.sql).
  *
  * [[classifiedCardTransactions]] reproduces the end-state model at full
  * fidelity: the exact normalization-variant set (desc_keep/nohyphen/noagg/
  * noagg_nohyphen/tail/alias + the alpha forms,
  * classified_card_transactions.sql:34-116), the priority lateral ranked
  * across ALL variants (:126-147), the name fallback gated on regex-null-or-
  * restaurants_misc (:173), the `coalesce(rx, nf)` resolution where a
  * non-null regex hit always wins (:188-193), the full 14-column enriched
  * projection (:247-261), and the venmo (:266-318) / bank-transfer
  * (:322-364) arms with the reference's rule content, UNION-distinct
  * across arms.
  *
  * Scale shape: normalization is all codegen'd built-ins in the scan; the
  * two matcher UDFs carry the compiled rule bank / name automaton in their
  * closures (broadcast once per executor) and run one pass per row — no
  * lateral join, no shuffle until the dimension joins, which broadcast.
  */
object CardModels {

  /** Payment-card list compared with NOT IN by both reference models
    * (card_transactions_model.sql:8, classified_card_transactions.sql:18).
    */
  val paymentCards: Seq[Int] = Seq(3221, 4245, 5083, 6823)

  /** Legacy-model clean_type (reference card_transactions_model.sql:6-15).
    * NOTE the reference's own arm order: a null-type row on a card OUTSIDE
    * the 4-card list is 'Payment'; the description patterns only decide
    * rows whose card IS in the list.
    */
  def cleanTypeLegacy(tpe: Column, cardLast4: Column, desc: Column): Column = {
    val pats = Seq("%online transfer%", "%edward jones%", "%jpmorgan chase%",
      "%fedwire%", "%automatic payment%")
    when(tpe.isNotNull, tpe)
      .when(!cardLast4.isin(paymentCards: _*), lit("Payment"))
      .when(pats.map(p => PgDialect.ilike(desc, p)).reduce(_ || _), lit("Payment"))
      .otherwise(lit("Sale"))
  }

  /** End-state-model clean_type (reference
    * classified_card_transactions.sql:15-27) — the legacy CASE plus the
    * '%Online Payment%' and '%Payment Thank You - Web%' patterns.
    */
  def cleanTypeEndState(tpe: Column, cardLast4: Column, desc: Column): Column = {
    val pats = Seq("%online payment%", "%online transfer%", "%edward jones%",
      "%jpmorgan chase%", "%fedwire%", "%automatic payment%",
      "%payment thank you - web%")
    when(tpe.isNotNull, tpe)
      .when(!cardLast4.isin(paymentCards: _*), lit("Payment"))
      .when(pats.map(p => PgDialect.ilike(desc, p)).reduce(_ || _), lit("Payment"))
      .otherwise(lit("Sale"))
  }

  /** U1: inline literal card dimension — the reference's actual rows
    * (card_names_model.sql:1-6: UNION ALL of 4 literal selects).
    */
  def cardNames(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (3221, "Chase", "Freedom"),
      (6823, "Chase", "Prime"),
      (4245, "Chase", "Sapphire"),
      (5083, "Wells Fargo", "Bilt"))
      .toDF("card_last4", "bank", "card_name")
  }

  /** Cleaned transactions (reference card_transactions_model.sql): project
    * with derived clean_type; no filter (the reference's WHERE is 1=1);
    * presentation order by amount desc.
    */
  def cardTransactionsModel(tx: DataFrame): DataFrame =
    tx.select(col("key"), col("date"), col("amount"), col("card_last4"),
        cleanTypeLegacy(col("type"), col("card_last4"), col("description"))
          .as("clean_type"),
        col("description").as("raw_description"),
        col("category").as("raw_category"),
        col("type").as("raw_type"))
      .orderBy(col("amount").desc)

  /** Aggregator-prefix strip pattern (reference
    * classified_card_transactions.sql:60-66): Square/Stripe/Eventbrite/
    * PayPal/TST/SumUp/Zettle tags with one optional punctuation char.
    */
  private val aggPrefix = "^(?:SPO|SQ|EB|PY|TST|SUMUP|ZETTLE)\\s*[^A-Za-z0-9]?\\s*"

  /** Airline alias expansions (reference :81-86). Pattern, replacement. */
  private val aliasRules: Seq[(String, String)] = Seq(
    "^BRITISH A\\b" -> "BRITISH AIRWAYS ",
    "^AMERICAN AI\\b" -> "AMERICAN AIRLINES ",
    "^UA\\s*INFLT\\b" -> "UNITED AIRLINES INFLIGHT ")

  /** Adds the full normalization-variant column set of the reference `norm`
    * CTE (classified_card_transactions.sql:34-116) to `df`. All built-ins —
    * stays inside whole-stage codegen. Added columns: desc_base, desc_keep,
    * desc_nohyphen, desc_noagg, desc_noagg_nohyphen, desc_tail, desc_alias
    * (nullable), desc_alpha, desc_alpha_noagg, desc_alphanospace,
    * desc_alpha_noagg_nospace.
    */
  def withNormVariants(df: DataFrame, desc: Column): DataFrame = {
    // clean HTML entity + smart/backtick quotes, collapse whitespace (:38-45)
    val base = trim(regexp_replace(
      replace(replace(replace(desc, lit("&amp;"), lit("&")),
        lit("\u2019"), lit("'")), lit("`"), lit("'")),
      "\\s+", " "))
    val alias = aliasRules.foldRight(lit(null).cast("string")) {
      case ((pat, repl), acc) =>
        when(col("desc_base").rlike("(?i)" + pat),
          regexp_replace(col("desc_base"), "(?i)" + pat, repl)).otherwise(acc)
    }
    // three withColumns batches (not 11 chained withColumn calls): each
    // call runs a full analysis pass over the whole plan, and this model
    // is built once per arm — batching columns by dependency depth keeps
    // the build cost flat as the plan grows
    df.withColumn("desc_base", base)
      .withColumns(Map(
        "desc_keep" -> col("desc_base"),
        "desc_nohyphen" ->
          regexp_replace(col("desc_base"), "\\s*[-/]\\s*", " "),
        "desc_noagg" ->
          regexp_replace(col("desc_base"), "(?i)" + aggPrefix, ""),
        "desc_tail" ->
          regexp_replace(col("desc_base"), "(?i)\\s*,\\s*[A-Z]{2}\\s*$", ""),
        "desc_alias" -> alias,
        "desc_alpha" ->
          lower(regexp_replace(col("desc_base"), "[^A-Za-z0-9]+", " "))))
      .withColumns(Map(
        "desc_noagg_nohyphen" ->
          regexp_replace(col("desc_noagg"), "\\s*[-/]\\s*", " "),
        "desc_alpha_noagg" ->
          lower(regexp_replace(col("desc_noagg"), "[^A-Za-z0-9]+", " ")),
        "desc_alphanospace" ->
          regexp_replace(col("desc_alpha"), "\\s+", "")))
      .withColumn("desc_alpha_noagg_nospace",
        regexp_replace(col("desc_alpha_noagg"), "\\s+", ""))
  }

  /** The 6 variants the regex lateral probes, in reference order (:139-144).
    * desc_alias participates only when non-null — bestKeyAny skips nulls.
    */
  def regexVariantCols: Seq[String] = Seq(
    "desc_keep", "desc_nohyphen", "desc_noagg", "desc_noagg_nohyphen",
    "desc_tail", "desc_alias")

  /** Best regex-rule key across ALL variants with the reference's runtime
    * demotion of generic keys (classified_card_transactions.sql:133-141:
    * restaurants_misc/unknown/misc at priority −100000). Rules are ranked
    * (adjusted priority desc, pattern length desc, key asc) and the FIRST
    * rule matching ANY variant wins — a low-priority rule hitting an early
    * variant cannot shadow a high-priority rule hitting a later one.
    */
  def regexRuleMatch(rules: Seq[RegexBank.Rule], demoted: Set[String])(
      variants: Column): Column = {
    val adjusted = rules.map { r =>
      if (demoted.contains(r.key)) r.copy(priority = r.priority - 100000) else r
    }
    // codegen'd expression over the variant array (BankBestMatchExpr) —
    // the bank rides the reference array, no per-row Seq/Option boxing
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    column(graft.operators.BankBestMatchExpr(
      expression(variants), adjusted, caseInsensitive = true))
  }

  /** Reference stoplist for hyper-generic fallback names (:182). */
  val nameStopList: Set[String] =
    Set("bar", "cafe", "market", "grill", "store", "shop")

  private def alphaForm(s: String): String =
    s.replaceAll("[^A-Za-z0-9]+", " ").toLowerCase

  /** Driver-side string twin of [[withNormVariants]]'s regex-probed
    * variant set (desc_keep/nohyphen/noagg/noagg_nohyphen/tail/alias) —
    * used by fixture builders that must know, BEFORE data exists, every
    * form a rule could be probed against (e.g. RefSeedFixture's
    * lookahead-rule drop filter). Kept adjacent to the Column version on
    * purpose: change one, change both.
    */
  private[graft] def normVariantStrings(desc: String): Seq[String] = {
    val base = desc.replace("&amp;", "&").replace("\u2019", "'")
      .replace("`", "'").replaceAll("\\s+", " ").trim
    val nohyphen = base.replaceAll("\\s*[-/]\\s*", " ")
    val noagg = base.replaceFirst("(?i)" + aggPrefix, "")
    val noaggNohyphen = noagg.replaceAll("\\s*[-/]\\s*", " ")
    val tail = base.replaceFirst("(?i)\\s*,\\s*[A-Z]{2}\\s*$", "")
    val alias = aliasRules.collectFirst {
      case (pat, repl)
          if java.util.regex.Pattern.compile("(?i)" + pat)
            .matcher(base).find() =>
        base.replaceFirst("(?i)" + pat, repl)
    }
    Seq(base, nohyphen, noagg, noaggNohyphen, tail) ++ alias.toSeq
  }

  /** The fallback candidate list: entries sorted by the reference's
    * priority (raw name length desc; merchant_key asc tie-break — the
    * reference's bare LIMIT 1 leaves ties to the engine), each with its
    * spaced (alpha, base-alpha) and no-space normal forms
    * (classified_card_transactions.sql:157-170).
    */
  private[graft] def prepareFallback(merchants: Seq[(String, String)],
      stopList: Set[String]): Array[(String, Array[String], Array[String])] =
    merchants
      .filter { case (_, name) => name != null && name.length >= 4 }
      .map { case (key, name) =>
        val nameAlpha = alphaForm(name)
        val nameBase = name.replaceAll("\\s*\\([^)]*\\)\\s*", " ")
        val nameBaseAlpha = alphaForm(nameBase)
        val spaced = Array(nameAlpha, nameBaseAlpha).distinct
        val nospace = spaced.map(_.replaceAll("\\s+", "")).distinct
        (key, name.length, nameBaseAlpha, spaced, nospace)
      }
      .filterNot { case (_, _, baseAlpha, _, _) => stopList.contains(baseAlpha) }
      .sortBy { case (key, len, _, _, _) => (-len, key) }
      .map { case (key, _, _, spaced, nospace) => (key, spaced, nospace) }
      .toArray

  /** Reference semantics of the fallback for ONE row — the property-check
    * twin of the Aho-Corasick path (first entry whose spaced form is
    * contained in desc_alpha_noagg or no-space form in the no-space
    * haystack).
    */
  private[graft] def fallbackNaive(
      prepared: Array[(String, Array[String], Array[String])])(
      alphaNoagg: String, alphaNoaggNospace: String): Option[String] =
    if (alphaNoagg == null) None
    else prepared.collectFirst {
      case (key, spaced, nospace)
          if spaced.exists(alphaNoagg.contains)
            || nospace.exists(n =>
              alphaNoaggNospace != null && alphaNoaggNospace.contains(n)) =>
        key
    }

  /** Name-containment fallback (reference
    * classified_card_transactions.sql:150-184): merchants with raw name
    * length ≥ 4 and non-stoplisted base-alpha form, probed as 4 normalized
    * forms against desc_alpha_noagg / desc_alpha_noagg_nospace; longest raw
    * name wins. Matching runs on two Aho-Corasick automata (one per
    * haystack form) — O(|text|) per row instead of O(names × |text|); the
    * automata ride the UDF closure, built once per executor.
    */
  def nameFallbackMatch(merchants: Seq[(String, String)],
      stopList: Set[String] = nameStopList)(
      descAlphaNoagg: Column, descAlphaNoaggNospace: Column): Column = {
    val prepared = prepareFallback(merchants, stopList)
    val keys: Array[String] = prepared.map(_._1)
    val spacedPats = new scala.collection.mutable.ArrayBuffer[String]
    val spacedEntry = new scala.collection.mutable.ArrayBuffer[Int]
    val nospacePats = new scala.collection.mutable.ArrayBuffer[String]
    val nospaceEntry = new scala.collection.mutable.ArrayBuffer[Int]
    prepared.zipWithIndex.foreach { case ((_, spaced, nospace), rank) =>
      spaced.foreach { p => spacedPats += p; spacedEntry += rank }
      nospace.foreach { p => nospacePats += p; nospaceEntry += rank }
    }
    val ac1 = new graft.functions.AhoCorasick(spacedPats.toArray)
    val ac2 = new graft.functions.AhoCorasick(nospacePats.toArray)
    val e1Of = spacedEntry.toArray
    val e2Of = nospaceEntry.toArray
    val f = udf { (alphaNoagg: String, alphaNoaggNospace: String) =>
      if (alphaNoagg == null) None
      else {
        val m1 = ac1.bestMatch(alphaNoagg)
        val r1 = if (m1 < 0) Int.MaxValue else e1Of(m1)
        val m2 = if (alphaNoaggNospace == null) -1 else ac2.bestMatch(alphaNoaggNospace)
        val r2 = if (m2 < 0) Int.MaxValue else e2Of(m2)
        val r = math.min(r1, r2)
        if (r == Int.MaxValue) None else Some(keys(r))
      }
    }
    f(descAlphaNoagg, descAlphaNoaggNospace)
  }

  /** W3 window dedup of the merchant→account map (reference
    * classified_card_transactions.sql:200-216): one row per merchant by
    * (coalesce(is_default,'TRUE') desc, effective_from desc nulls last,
    * account_id desc).
    */
  def mapOne(merchantAccountMap: DataFrame): DataFrame =
    TopPerGroup.top1(merchantAccountMap,
      Seq(col("merchant_key")),
      Seq(coalesce(col("is_default"), lit("TRUE")).desc,
        col("effective_from").desc_nulls_last,
        col("account_id").desc))

  /** The 7 enrichment columns carried from accounts_leaf (:223-236). */
  private val leafCols = Seq("category", "subcategory", "billing_model",
    "spend_nature", "discretion", "gl_code", "account_name")

  /** Full-fidelity classification pipeline (reference
    * classified_card_transactions.sql). Output schema is the reference's
    * final 14-column projection: date, amount, card_last4, description,
    * merchant_key, merchant_name, category, subcategory, billing_model,
    * spend_nature, discretion, account_id, gl_code, account_name — UNION
    * (distinct) across the card / venmo / bank arms, no surrogate key.
    *
    * Seeds are small: regex rules and merchant names ride broadcast inside
    * the matcher closures; the dimension joins use explicit broadcast hints.
    */
  def classifiedCardTransactions(
      tx: DataFrame,
      merchantRegex: Seq[RegexBank.Rule],
      merchants: DataFrame,
      merchantAccountMap: DataFrame,
      accountsLeaf: DataFrame,
      merchantNameList: Seq[(String, String)],
      stopList: Set[String] = nameStopList,
      demotedKeys: Set[String] = Set("restaurants_misc", "unknown", "misc")): DataFrame = {

    // base (:4-29): Sales by the end-state clean_type CASE. The reference
    // excludes venmo-prefixed rows in the final card-arm WHERE
    // (:264-265, case-sensitive on the raw description) — filtered here
    // early, result-identical and pushdown-friendly. A NULL description
    // fails `left(d,5) != 'venmo'` in PG and is dropped — `=!=` matches.
    val base = tx
      .filter(cleanTypeEndState(col("type"), col("card_last4"),
        col("description")) === "Sale")
      .filter(PgDialect.leftStr(col("description"), 5) =!= "venmo")
      .withColumnRenamed("category", "category_old")

    val norm = withNormVariants(base, col("description"))

    // array_distinct: probing a duplicate variant can't change bestKeyAny's
    // result, and most descriptions collapse to 2-3 distinct variants of 6
    // — halves the regex work per row
    val matched = norm
      .withColumn("rx_key", regexRuleMatch(merchantRegex, demotedKeys)(
        array_distinct(array(regexVariantCols.map(col): _*))))
      // fallback computed only when regex failed or hit restaurants_misc
      // (:173); resolution is coalesce(rx, nf) (:190) — a non-null regex
      // key (even restaurants_misc) always wins, so the fallback decides
      // only regex-null rows. The reference's lateral computes nf for
      // restaurants_misc rows too and then discards it; the gate here is
      // the same semantics minus the dead work.
      .withColumn("nf_key",
        when(col("rx_key").isNull,
          nameFallbackMatch(merchantNameList, stopList)(
            col("desc_alpha_noagg"), col("desc_alpha_noagg_nospace"))))
      .withColumn("merchant_key", coalesce(col("rx_key"), col("nf_key")))

    val enriched = matched
      .join(broadcast(merchants.select(col("merchant_key"),
        col("merchant_name"))), Seq("merchant_key"), "left")
      .join(broadcast(mapOne(merchantAccountMap)
        .select("merchant_key", "account_id")), Seq("merchant_key"), "left")
      .join(broadcast(accountsLeaf.select(
        (Seq("account_id") ++ leafCols).map(col): _*)),
        Seq("account_id"), "left")

    // final card-arm projection (:247-261): Unknown defaults on every
    // enrichment column except gl_code (coalesce(gl_code, null) = gl_code).
    val cardArm = enriched.select(
      col("date"),
      col("amount"),
      col("card_last4"),
      col("description"),
      coalesce(col("merchant_key"), lit("Unknown")).as("merchant_key"),
      coalesce(col("merchant_name"), lit("Unknown")).as("merchant_name"),
      coalesce(col("category"), lit("Unknown")).as("category"),
      coalesce(col("subcategory"), lit("Unknown")).as("subcategory"),
      coalesce(col("billing_model"), lit("Unknown")).as("billing_model"),
      coalesce(col("spend_nature"), lit("Unknown")).as("spend_nature"),
      coalesce(col("discretion"), lit("Unknown")).as("discretion"),
      coalesce(col("account_id"), lit("Unknown")).as("account_id"),
      col("gl_code"),
      coalesce(col("account_name"), lit("Unknown")).as("account_name"))

    // venmo arm (:266-318): ALL venmo-prefixed rows (no type filter),
    // 6-char prefix stripped with PG right() semantics, counterparty CASE
    // on raw description / intermediate_key.
    def anyIlike(c: Column, pat: String): Column = PgDialect.ilike(c, pat)
    val fertility = anyIlike(col("description"), "%proto faff surplus seed fund%")
    val lorna = anyIlike(col("intermediate_key"), "%Lorna Kerry%")
    val lisa = anyIlike(col("intermediate_key"), "%Lisa Raich%")
    val sofia = anyIlike(col("intermediate_key"), "%Sofia Mesa%")
    val venmo = tx
      .filter(PgDialect.leftStr(col("description"), 5) === "venmo")
      .select(
        col("date"),
        col("amount"),
        lit(0).as("card_last4"),
        PgDialect.rightStrCol(col("description"),
          length(col("description")) - 6).as("description"),
        lit("venmo").as("merchant_key"),
        lit("Venmo").as("merchant_name"),
        when(fertility, "Health & Wellness").when(lorna, "Food & Groceries")
          .when(lisa, "Personal Services")
          .when(sofia, "Entertainment & Events")
          .otherwise("Personal Services").as("category"),
        when(fertility, "Fertility").when(lorna, "Groceries")
          .when(lisa, "Personal Care").when(sofia, "Bars & Nightlife")
          .otherwise("Personal Care").as("subcategory"),
        lit("one_off").as("billing_model"),
        lit("consumption").as("spend_nature"),
        lit("discretionary").as("discretion"),
        when(fertility, "acct_93cc197271").when(lorna, "acct_a0f371c808")
          .when(lisa, "acct_f183bb01ee").when(sofia, "acct_252a9dfee6")
          .otherwise("acct_f183bb01ee").as("account_id"),
        when(fertility, 5550).when(lorna, 5110).when(lisa, 6110)
          .when(sofia, 5730).otherwise(6110).as("gl_code"),
        when(fertility, "Health—Fertility").when(lorna, "Food—Groceries")
          .when(lisa, "Services—Personal Care")
          .when(sofia, "Entertainment—Bars & Nightlife")
          .otherwise("Services—Personal Care").as("account_name"))

    // bank-transfer arm (:322-364): the 2 transfer cards + counterparty
    // filter, sign-dependent Travel/Flights vs Housing/Rent enrichment
    // (amount = 0 → NULL category/subcategory/... — the reference CASE has
    // no ELSE).
    val neg = col("amount") < 0
    val pos = col("amount") > 0
    val bank = tx
      .filter(col("card_last4").isin(3206, 9155)
        && anyIlike(col("description"), "%Lorna%"))
      .select(
        col("date"),
        col("amount"),
        col("card_last4"),
        col("description"),
        lit("bank_transfer").as("merchant_key"),
        lit("Bank Transfer").as("merchant_name"),
        when(neg, "Travel").when(pos, "Housing").as("category"),
        when(neg, "Flights").when(pos, "Rent").as("subcategory"),
        when(neg, "one_off").when(pos, "subscription").as("billing_model"),
        lit("consumption").as("spend_nature"),
        when(neg, "discretionary").when(pos, "mandatory").as("discretion"),
        when(neg, "acct_1d9ae90683").when(pos, "acct_329a7781bd").as("account_id"),
        when(neg, 5310).when(pos, 5010).as("gl_code"),
        // the reference mixes em-dash and ASCII hyphen here — kept verbatim
        when(neg, "Travel—Flights").when(pos, "Housing-Rent").as("account_name"))

    // UNION (distinct) across arms, PG semantics (:263,320) — dedup over
    // all 14 columns. Presentation ORDER BY (date desc, amount asc) omitted:
    // result-set contract is unordered.
    cardArm.union(venmo).union(bank).distinct()
  }
}
