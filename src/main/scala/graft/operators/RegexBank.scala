package graft.operators

import graft.dialect.PgDialect
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import java.util.regex.Pattern

/** Priority-ranked regex-rule classification — the scale-path rewrite of the
  * reference's per-row `LEFT JOIN LATERAL (select ... from merchant_regex
  * where n.desc ~* r.pattern_regex order by priority desc, length(pattern)
  * desc limit 1)` (reference models/classified_card_transactions.sql:126-147,
  * seeds/merchant_regex.csv: 795 rules).
  *
  * Two interchangeable strategies:
  *  - [[bestMatchExpr]]: rules pre-sorted by (priority desc, pattern length
  *    desc, key), compiled ONCE per executor, evaluated first-match-wins in a
  *    single pass per row — O(rules) with early exit, no join, no shuffle.
  *    This is what runs at 100 TB: the rule table rides inside the closure
  *    (broadcast by the task serializer), the scan stays embarrassingly
  *    parallel.
  *  - [[bestMatchJoin]]-style lateral rewrite via crossJoin + TopPerGroup is
  *    intentionally NOT provided as the default: at 795 rules × N rows it is
  *    strictly worse; use the expression.
  */
object RegexBank {

  /** One classification rule. `demote` mirrors the reference's runtime
    * priority adjustment (classified_card_transactions.sql:141-144 demotes
    * restaurants_misc/unknown/misc by 100000).
    */
  final case class Rule(key: String, pattern: String, priority: Int)

  /** Required-literal extraction for the Aho-Corasick prefilter: a rule
    * only needs its regex evaluated on texts containing one of its
    * required literals (a NECESSARY condition — boundaries/anchors still
    * checked by the regex). Returns None when no safe literal exists (the
    * rule is then always checked). Handles the shapes the reference's 795
    * seed rules actually use: plain literals, `^`/`$` anchors, `\y`/`\b`
    * boundaries, escaped punctuation, and a single top-level alternation
    * of plain literals (optionally parenthesized).
    */
  private[graft] def requiredLiterals(pattern: String): Option[Seq[String]] = {
    var s = pattern
    if (s.startsWith("^")) s = s.substring(1)
    if (s.endsWith("$") && !s.endsWith("\\$")) s = s.dropRight(1)
    s = s.replace("\\y", "").replace("\\b", "")
      .replace("\\m", "").replace("\\M", "")
    if (s.startsWith("(") && s.endsWith(")")) s = s.substring(1, s.length - 1)
    val metas = "()[]{}|?*+.^$"
    def unescapeLiteral(t: String): Option[String] = {
      val sb = new StringBuilder
      var i = 0
      while (i < t.length) {
        val ch = t.charAt(i)
        if (ch == '\\') {
          if (i + 1 >= t.length) return None
          val nxt = t.charAt(i + 1)
          if (Character.isLetterOrDigit(nxt)) return None // \d, \s, ... classes
          sb.append(nxt); i += 2
        } else if (metas.indexOf(ch) >= 0) return None
        else { sb.append(ch); i += 1 }
      }
      if (sb.isEmpty) None else Some(sb.toString)
    }
    // top-level alternation: every branch must reduce to a plain literal
    val branches = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var depth = 0; var i = 0; var ok = true
      while (i < s.length && ok) {
        val ch = s.charAt(i)
        if (ch == '\\' && i + 1 < s.length) { cur.append(ch).append(s.charAt(i + 1)); i += 2 }
        else {
          if (ch == '(') depth += 1
          if (ch == ')') { depth -= 1; if (depth < 0) ok = false }
          if (ch == '|' && depth == 0) { out += cur.toString; cur.clear() }
          else cur.append(ch)
          i += 1
        }
      }
      if (!ok) Seq(s) else { out += cur.toString; out.toSeq }
    }
    val lits = branches.map(unescapeLiteral)
    if (lits.forall(_.isDefined)) Some(lits.map(_.get)) else None
  }

  final class CompiledBank(rules: Seq[Rule], caseInsensitive: Boolean)
      extends Serializable {
    // Effective order: priority desc, pattern length desc, key asc — the
    // lateral's ORDER BY plus a total-order tie-breaker.
    private val sorted: Array[Rule] =
      rules.sortBy(r => (-r.priority, -r.pattern.length, r.key)).toArray
    // prefilter literals, lowercased to match lowercased probe texts;
    // rules without a safe literal are unconditionally checked
    private val litPatterns = scala.collection.mutable.ArrayBuffer.empty[String]
    private val litRule = scala.collection.mutable.ArrayBuffer.empty[Int]
    private val alwaysCheck = scala.collection.mutable.ArrayBuffer.empty[Int]
    sorted.zipWithIndex.foreach { case (r, i) =>
      requiredLiterals(r.pattern) match {
        case Some(ls) if ls.forall(_.forall(_ < 128)) =>
          ls.foreach { l =>
            litPatterns += l.toLowerCase(java.util.Locale.ROOT); litRule += i
          }
        case _ => alwaysCheck += i
      }
    }
    private val alwaysArr: Array[Int] = alwaysCheck.toArray
    private val litRuleArr: Array[Int] = litRule.toArray
    @transient private lazy val prefilter =
      new graft.functions.AhoCorasick(litPatterns.toArray)
    @transient private lazy val compiled: Array[(Pattern, String)] =
      sorted.map { r =>
        val flags = if (caseInsensitive) Pattern.CASE_INSENSITIVE else 0
        (Pattern.compile(PgDialect.translateRegex(r.pattern), flags), r.key)
      }

    /** Candidate rule indices (ascending = priority order) whose required
      * literal occurs in any of the texts, plus the always-check rules.
      */
    private def candidates(vs: Iterator[String]): java.util.BitSet = {
      val litBits = new java.util.BitSet(litPatterns.length)
      vs.foreach { s =>
        if (s != null)
          prefilter.collectInto(s.toLowerCase(java.util.Locale.ROOT), litBits)
      }
      val ruleBits = new java.util.BitSet(sorted.length)
      var b = litBits.nextSetBit(0)
      while (b >= 0) { ruleBits.set(litRuleArr(b)); b = litBits.nextSetBit(b + 1) }
      var i = 0
      while (i < alwaysArr.length) { ruleBits.set(alwaysArr(i)); i += 1 }
      ruleBits
    }
    def bestKey(s: String): String = {
      if (s == null) return null
      val cand = candidates(Iterator.single(s))
      var i = cand.nextSetBit(0)
      while (i >= 0) {
        if (compiled(i)._1.matcher(s).find()) return compiled(i)._2
        i = cand.nextSetBit(i + 1)
      }
      null
    }

    /** Best key across a SET of string variants: rules are walked in
      * (priority desc, length desc, key) order and the first rule matching
      * ANY variant wins — the reference lateral's semantics
      * (classified_card_transactions.sql:126-147: one `ORDER BY prio DESC
      * ... LIMIT 1` over rules matching any of the OR'd variants). A
      * variant-major walk (bestKey per variant, first non-null) is WRONG:
      * it lets a low-priority rule on an early variant shadow a
      * high-priority rule that only matches a later variant.
      */
    def bestKeyAny(vs: Seq[String]): String = {
      if (vs == null) return null
      // Aho-Corasick prefilter: one O(|text|) scan of the variants yields
      // the candidate rule set; only those regexes run (priority order is
      // the ascending bit order). With literal-bearing banks (all but a
      // handful of the reference's 795 rules) non-matching rows run zero
      // regexes.
      val cand = candidates(vs.iterator)
      var i = cand.nextSetBit(0)
      while (i >= 0) {
        val p = compiled(i)._1
        val it = vs.iterator
        while (it.hasNext) {
          val s = it.next()
          if (s != null && p.matcher(s).find()) return compiled(i)._2
        }
        i = cand.nextSetBit(i + 1)
      }
      null
    }
  }

  /** Column returning the winning rule key (null if no rule matches).
    * A real Catalyst expression ([[BankBestMatchExpr]]), not a UDF: the
    * compiled bank rides the plan's reference array, the generated code
    * calls it directly, and the surrounding operators keep their
    * whole-stage-codegen spans — no per-row Option boxing on the hottest
    * classifier path.
    */
  def bestMatchExpr(rules: Seq[Rule], caseInsensitive: Boolean = true)(c: Column): Column = {
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    column(BankBestMatchExpr(expression(c), rules, caseInsensitive))
  }

  /** Codegen-friendly variant for small banks: first-match-wins compiled to a
    * chained CASE of `rlike` predicates (the same shape as the reference's
    * 600-branch merchant CASE, models/card_merchants_model.sql:2-620). Stays
    * inside whole-stage codegen; prefer it when the bank is ≲100 rules.
    *
    * Built as ONE flat CaseWhen (chained `.when`, no-match → null default),
    * not `when(..).otherwise(when(..))` nesting: N nested CaseWhen nodes
    * cost O(N) recursion depth in every tree walk (the Column→Expression
    * converter overflowed the stack at ~300 branches when entered from an
    * already-deep call stack), while one N-branch CaseWhen walks in
    * constant depth — the same shape `MerchantCase` uses for the 532-branch
    * reference classifier.
    */
  def bestMatchChain(rules: Seq[Rule], caseInsensitive: Boolean = true)(c: Column): Column = {
    val sorted = rules.sortBy(r => (-r.priority, -r.pattern.length, r.key))
    val prefix = if (caseInsensitive) "(?i)" else ""
    def cond(r: Rule): Column = c.rlike(prefix + PgDialect.translateRegex(r.pattern))
    sorted.tail.foldLeft(when(cond(sorted.head), lit(sorted.head.key))) {
      (acc, r) => acc.when(cond(r), lit(r.key))
    }.otherwise(lit(null).cast("string"))
  }
}

/** `bank_best_match(textOrVariants)` — the winning rule key of a compiled
  * priority-ranked regex bank, as a codegen'd Catalyst expression. Accepts
  * a STRING child (single probe text → CompiledBank.bestKey) or an
  * ARRAY<STRING> child (variant set → CompiledBank.bestKeyAny, first rule
  * matching ANY variant wins). The expression instance itself is placed in
  * the plan's reference array (`addReferenceObj`) and the generated code
  * calls [[bestFromString]]/[[bestFromArray]] directly, so the AC-prefiltered
  * match loop runs inside whole-stage codegen with proper null propagation
  * and zero per-row boxing — replacing the closure UDF this expression
  * grew out of.
  */
case class BankBestMatchExpr(child: org.apache.spark.sql.catalyst.expressions.Expression,
    rules: Seq[RegexBank.Rule], caseInsensitive: Boolean)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
  import org.apache.spark.unsafe.types.UTF8String

  // lazy: the child is typically unresolved when the expression is built
  // (plain Column references); dataType is only queryable after analysis
  @transient private lazy val isArray = child.dataType match {
    case ArrayType(StringType, _) => true
    case StringType => false
    case other => throw new IllegalArgumentException(
      s"bank_best_match needs string or array<string>, got $other")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val bank =
    new RegexBank.CompiledBank(rules, caseInsensitive)

  def bestFromString(s: UTF8String): UTF8String = {
    val r = bank.bestKey(s.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  def bestFromArray(a: ArrayData): UTF8String = {
    val n = a.numElements()
    val vs = new Array[String](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) vs(i) = a.getUTF8String(i).toString
      i += 1
    }
    val r = bank.bestKeyAny(scala.collection.immutable.ArraySeq.unsafeWrapArray(vs))
    if (r == null) null else UTF8String.fromString(r)
  }

  override def nullSafeEval(v: Any): Any =
    if (isArray) bestFromArray(v.asInstanceOf[ArrayData])
    else bestFromString(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bankMatch", this, classOf[BankBestMatchExpr].getName)
    val method = if (isArray) "bestFromArray" else "bestFromString"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $ref.$method($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bank_best_match"
}
