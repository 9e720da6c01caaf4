package graft.models

import graft.dialect.PgDialect
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The legacy 532-branch merchant classifier CASE (reference
  * models/card_merchants_model.sql:2-620) as *data*: the branch content is
  * extracted verbatim by tools/extract_merchant_case.py into
  * resources/graft/merchant_case.tsv (seq, raw condition SQL, merchant,
  * source line) and compiled here in two independent ways —
  *
  *  - [[chainColumn]]: an ordered Catalyst when-chain whose ILIKE terms go
  *    through PgDialect.ilike (codegen'd LIKE over lower()), and
  *  - [[spendShareOracleSql]]: the same condition text embedded verbatim in
  *    a DuckDB CASE —
  *
  * so the rule *content* itself is oracle-checked (shadowing order, the
  * `and not ilike` exclusions, the Payment prefilter), not just the
  * when-chain capability that q11 covers. The probe fixture
  * ([[legacyTxSql]]) synthesizes one description per branch (first positive
  * pattern, `%` stripped) so nearly every branch is exercised, including
  * the ones shadowed by earlier branches.
  */
object MerchantCase {

  /** One `[not] ilike` term of a branch condition. */
  final case class Term(pattern: String, negated: Boolean)

  /** A when-branch: OR across conjunctions, AND within; source order is
    * evaluation order.
    */
  final case class Branch(seq: Int, condition: Seq[Seq[Term]], raw: String,
      merchant: String)

  lazy val branches: Seq[Branch] = {
    val in = getClass.getResourceAsStream("/graft/merchant_case.tsv")
    require(in != null, "merchant_case.tsv missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().filterNot(_.startsWith("#")).map { line =>
        val f = line.split('\t')
        Branch(f(0).toInt, parseCondition(f(1)), f(1), f(2))
      }.toVector
    } finally src.close()
  }

  // ---------------------------------------------------------- the parser

  /** Tokenize a condition: bare words lowercased, quoted literals kept
    * verbatim (unescaped, prefixed with `'` to mark them).
    */
  private def tokenize(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch.isWhitespace) i += 1
      else if (ch == '\'') {
        val sb = new StringBuilder("'")
        i += 1
        var done = false
        while (!done) {
          require(i < s.length, s"unterminated string in: $s")
          val c = s.charAt(i)
          if (c == '\'') {
            if (i + 1 < s.length && s.charAt(i + 1) == '\'') {
              sb.append('\''); i += 2
            } else { done = true; i += 1 }
          } else { sb.append(c); i += 1 }
        }
        out += sb.toString
      } else {
        val j0 = i
        while (i < s.length && !s.charAt(i).isWhitespace) i += 1
        out += s.substring(j0, i).toLowerCase(java.util.Locale.ROOT)
      }
    }
    out.result()
  }

  /** Grammar (all the reference's branches fit it — enforced by the
    * extractor): cond := conj ('or' conj)* ; conj := term ('and' term)* ;
    * term := 'description' ['not'] 'ilike' STRING.
    */
  private[graft] def parseCondition(s: String): Seq[Seq[Term]] = {
    val toks = tokenize(s)
    val conjs = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Term])
    var i = 0
    def term(): Term = {
      require(toks(i) == "description", s"expected description at $i in: $s")
      i += 1
      val neg = toks(i) == "not"
      if (neg) i += 1
      require(toks(i) == "ilike", s"expected ilike at $i in: $s")
      i += 1
      require(toks(i).startsWith("'"), s"expected pattern at $i in: $s")
      val p = toks(i).substring(1)
      i += 1
      Term(p, neg)
    }
    conjs.last += term()
    while (i < toks.length) {
      toks(i) match {
        case "and" => i += 1; conjs.last += term()
        case "or" =>
          i += 1
          conjs += scala.collection.mutable.ArrayBuffer(term())
        case t => throw new IllegalArgumentException(s"unexpected '$t' in: $s")
      }
    }
    conjs.map(_.toSeq).toSeq
  }

  // ------------------------------------------------------ Spark when-chain

  private def condCol(c: Seq[Seq[Term]], dlow: Column): Column =
    c.map(_.map { t =>
      // the input is pre-lowered ONCE (see chainColumn) so each term is a
      // bare LIKE on an attribute — LikeSimplification rewrites the
      // wildcard-free shapes to StartsWith/EndsWith/Contains
      val m = dlow.like(t.pattern.toLowerCase(java.util.Locale.ROOT))
      if (t.negated) !m else m
    }.reduce(_ && _)).reduce(_ || _)

  /** The ordered classifier chain over an ALREADY-LOWERCASED description
    * attribute. Callers should project `lower(description)` into its own
    * column first: a 532-branch CaseWhen sits outside whole-stage codegen's
    * subexpression elimination, so a shared lower() subtree would be
    * re-evaluated per term (~600×/row). ILIKE = LIKE against lowercased
    * patterns (content is ASCII — enforced by the extractor).
    */
  def chainLowered(dlow: Column): Column = {
    val head = branches.head
    branches.tail
      .foldLeft(when(condCol(head.condition, dlow), lit(head.merchant))) {
        (acc, b) => acc.when(condCol(b.condition, dlow), lit(b.merchant))
      }
      .otherwise(lit("Uncategorized"))
  }

  /** Convenience form over a raw description column (spec-sized inputs —
    * see [[chainLowered]] for why big scans should pre-project).
    */
  def chainColumn(desc: Column): Column = chainLowered(lower(desc))

  /** The same 532 branches as ONE compiled expression
    * ([[graft.operators.IlikeChain]]): Aho-Corasick candidate prefilter +
    * Spark-LIKE-semantics regexes, single plan node. This is the form q38
    * ships — the declarative [[chainLowered]] stays as its spec-checked
    * twin (MerchantCaseSpec asserts they agree row-for-row).
    */
  lazy val compiledChain: graft.operators.IlikeChain.CompiledChain = {
    import graft.operators.IlikeChain
    new IlikeChain.CompiledChain(
      branches.map(b => IlikeChain.Branch(
        b.condition.map(_.map(t => IlikeChain.Term(
          t.pattern.toLowerCase(java.util.Locale.ROOT), t.negated)).toArray).toArray,
        b.merchant)).toArray,
      "Uncategorized")
  }

  /** Classifier column via the compiled single-node expression. */
  def chainExpr(desc: Column): Column =
    graft.operators.IlikeChain.matchCol(desc, compiledChain)

  /** The complete legacy model (reference card_merchants_model.sql): the
    * legacy Payment prefilter, the 532-branch classifier, and the
    * spend/cumulative/percent tail (:621-639) with exact decimal sums
    * reported as double. Used by the reference DAG
    * (`ReferencePipeline`) and by q38 over the probe fixture.
    */
  def legacyMerchantsModel(tx: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    tx.filter(CardModels.cleanTypeLegacy(
        col("type"), col("card_last4"), col("description")) === "Sale")
      .select(chainExpr(col("description")).as("merchant_name_modified"),
        col("amount"))
      .groupBy(col("merchant_name_modified"))
      .agg(sum(col("amount").cast(DecimalType(18, 2))).as("spend_dec"))
      .withColumn("total_dec", sum(col("spend_dec")).over(Window.partitionBy()))
      .select(
        col("merchant_name_modified"),
        col("spend_dec").cast("double").as("total_spend"),
        col("total_dec").cast("double").as("cumulative_spend"),
        (col("spend_dec").cast("double") / col("total_dec").cast("double"))
          .as("percent_spend"))
  }

  // ------------------------------------------------------- probe fixture

  /** One description per branch: the first positive pattern with `%`
    * stripped ('_' and literal '*' kept — both engines treat them alike).
    * Matches its own branch unless an earlier branch shadows it, which is
    * exactly the semantics under test.
    */
  private[graft] def probeFor(b: Branch): String = {
    val pat = b.condition.head.find(!_.negated)
      .getOrElse(sys.error(s"branch ${b.seq} has no positive term"))
      .pattern
    val p = pat.replace("%", "")
    require(p.nonEmpty, s"branch ${b.seq} probe empty")
    p
  }

  /** Extra rows that exercise the Payment prefilter's description arms and
    * the ELSE → 'Uncategorized' fallback.
    */
  private val noiseProbes = Seq(
    "Online Transfer from Chase 01",
    "EDWARD JONES INVESTMENT 02", // branch hit when type='Sale', filtered when null
    "JPMorgan Chase Transfer 03",
    "Fedwire Credit 04",
    "Automatic Payment - Thank You",
    "ZZZ NOMATCH 42")

  private lazy val probes: Seq[String] =
    branches.map(probeFor) ++ noiseProbes

  /** card_transactions for the legacy model, synthesized from `orders`.
    * Cycles: description over all probes, type over Sale/Refund/NULL,
    * card_last4 over one out-of-list + the blessed list, amount sign over
    * mod 7.
    *
    * The probe lookup is an ARRAY-LITERAL SUBSCRIPT, not a 538-arm CASE: a
    * CASE this wide is a ~1100-node expression that downstream predicate
    * pushdown would substitute into every filter referencing `description`
    * (measured ~10 s of optimizer + re-eval cost), while `array(...)[k]`
    * constant-folds to one literal. Spark subscripts 0-based, DuckDB
    * 1-based, so the two texts differ ONLY in that expression — both are
    * generated from the same probe seq (`sparkDialect` flag).
    */
  def legacyTxSql(ordersTable: String, sparkDialect: Boolean): String = {
    val quoted = probes.map(p => s"'${p.replace("'", "''")}'").mkString(",\n    ")
    val idx = s"CAST(o_orderkey % ${probes.length} AS INTEGER)"
    val probeExpr =
      if (sparkDialect) s"array(\n    $quoted)[$idx]"
      else s"[\n    $quoted][$idx + 1]"
    s"""SELECT
       |  CAST(o_orderkey AS VARCHAR(30)) AS key,
       |  o_orderdate AS date,
       |  CASE WHEN o_orderkey % 7 = 0 THEN -CAST(o_totalprice AS DECIMAL(18,2))
       |       ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS amount,
       |  CASE CAST(o_orderkey % 9 AS INTEGER) WHEN 0 THEN 1111 WHEN 1 THEN 3206
       |       WHEN 2 THEN 4245 WHEN 3 THEN 5083 WHEN 4 THEN 6823
       |       ELSE 3221 END AS card_last4,
       |  $probeExpr AS description,
       |  CASE WHEN o_orderkey % 5 = 0 THEN 'Sale'
       |       WHEN o_orderkey % 5 = 4 THEN 'Refund'
       |       ELSE CAST(NULL AS VARCHAR(10)) END AS type
       |FROM $ordersTable""".stripMargin
  }

  // -------------------------------------------------------- DuckDB oracle

  /** The whole legacy model as the DuckDB oracle: probe fixture, Payment
    * prefilter (card_merchants_model.sql:626-637), the 532 conditions
    * verbatim, spend/share agg tail (:621-639) with exact decimal sums cast
    * to double (shared-arithmetic convention: both engines divide the same
    * doubles).
    */
  def spendShareOracleSql: String = {
    val whens = branches.map { b =>
      s"      WHEN ${b.raw} THEN '${b.merchant.replace("'", "''")}'"
    }.mkString("\n")
    s"""WITH tx AS (
       |${legacyTxSql("orders", sparkDialect = false)}
       |), base AS (
       |  SELECT * FROM tx t
       |  WHERE (CASE WHEN t.type IS NOT NULL THEN t.type
       |              WHEN t.card_last4 NOT IN (3221, 4245, 5083, 6823) THEN 'Payment'
       |              WHEN t.description ILIKE '%Online Transfer%'
       |                OR t.description ILIKE '%Edward Jones%'
       |                OR t.description ILIKE '%JPMorgan Chase%'
       |                OR t.description ILIKE '%Fedwire%'
       |                OR t.description ILIKE '%Automatic Payment%' THEN 'Payment'
       |              ELSE 'Sale' END) = 'Sale'
       |), named AS (
       |  SELECT
       |    CASE
       |$whens
       |      ELSE 'Uncategorized' END AS merchant_name_modified,
       |    amount
       |  FROM base
       |), agg AS (
       |  SELECT merchant_name_modified, SUM(amount) AS spend_dec
       |  FROM named GROUP BY 1
       |)
       |SELECT merchant_name_modified,
       |  CAST(spend_dec AS DOUBLE) AS total_spend,
       |  CAST(SUM(spend_dec) OVER () AS DOUBLE) AS cumulative_spend,
       |  CAST(spend_dec AS DOUBLE) / CAST(SUM(spend_dec) OVER () AS DOUBLE)
       |    AS percent_spend
       |FROM agg""".stripMargin
  }
}
