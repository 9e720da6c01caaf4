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

  final class CompiledBank(rules: Seq[Rule], caseInsensitive: Boolean)
      extends Serializable {
    // Effective order: priority desc, pattern length desc, key asc — the
    // lateral's ORDER BY plus a total-order tie-breaker.
    private val sorted: Array[Rule] =
      rules.sortBy(r => (-r.priority, -r.pattern.length, r.key)).toArray
    @transient private lazy val compiled: Array[(Pattern, String)] =
      sorted.map { r =>
        val flags = if (caseInsensitive) Pattern.CASE_INSENSITIVE else 0
        (Pattern.compile(PgDialect.translateRegex(r.pattern), flags), r.key)
      }
    def bestKey(s: String): String = {
      if (s == null) return null
      var i = 0
      while (i < compiled.length) {
        if (compiled(i)._1.matcher(s).find()) return compiled(i)._2
        i += 1
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
      var i = 0
      while (i < compiled.length) {
        val p = compiled(i)._1
        val it = vs.iterator
        while (it.hasNext) {
          val s = it.next()
          if (s != null && p.matcher(s).find()) return compiled(i)._2
        }
        i += 1
      }
      null
    }
  }

  /** Column returning the winning rule key (null if no rule matches). */
  def bestMatchExpr(rules: Seq[Rule], caseInsensitive: Boolean = true)(c: Column): Column = {
    val bank = new CompiledBank(rules, caseInsensitive)
    val f = udf((s: String) => Option(bank.bestKey(s)))
    f(c)
  }

  /** Codegen-friendly variant for small banks: first-match-wins compiled to a
    * chained CASE of `rlike` predicates (the same shape as the reference's
    * 600-branch merchant CASE, models/card_merchants_model.sql:2-620). Stays
    * inside whole-stage codegen; prefer it when the bank is ≲100 rules.
    */
  def bestMatchChain(rules: Seq[Rule], caseInsensitive: Boolean = true)(c: Column): Column = {
    val sorted = rules.sortBy(r => (-r.priority, -r.pattern.length, r.key))
    val prefix = if (caseInsensitive) "(?i)" else ""
    sorted.foldRight(lit(null).cast("string")) { (r, acc) =>
      when(c.rlike(prefix + PgDialect.translateRegex(r.pattern)), lit(r.key)).otherwise(acc)
    }
  }
}
