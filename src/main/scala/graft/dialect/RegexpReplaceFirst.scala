package graft.dialect

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import java.util.regex.Pattern

/** First-occurrence regexp_replace — the PG `regexp_replace(s, p, r)` without
  * the 'g' flag and the 6-arg `regexp_replace(s, p, r, 1, 1, 'i')` form
  * (reference models/classified_card_transactions.sql:85-87). Spark's
  * RegExpReplace is replace-all only, hence this custom scalar Expression.
  * The compiled Pattern is cached across rows for the (typical) foldable
  * pattern argument. Non-codegen (CodegenFallback) is acceptable: it is used
  * on the classification path where the regex itself dominates cost.
  */
case class RegexpReplaceFirst(subject: Expression, regexp: Expression,
    rep: Expression) extends TernaryExpression with CodegenFallback {

  override def first: Expression = subject
  override def second: Expression = regexp
  override def third: Expression = rep

  override def dataType: DataType = StringType
  override def nullable: Boolean =
    subject.nullable || regexp.nullable || rep.nullable

  @transient private var lastRegex: String = _
  @transient private var lastPattern: Pattern = _
  @transient private var lastRep: String = _
  @transient private var lastRepJava: String = _

  override def nullSafeEval(s: Any, p: Any, r: Any): Any = {
    val patStr = p.asInstanceOf[UTF8String].toString
    if (patStr != lastRegex) {
      lastRegex = patStr
      lastPattern = Pattern.compile(patStr)
    }
    val repStr = r.asInstanceOf[UTF8String].toString
    if (repStr != lastRep) {
      lastRep = repStr
      lastRepJava = RegexpReplaceFirst.pgReplacementToJava(repStr)
    }
    val m = lastPattern.matcher(s.asInstanceOf[UTF8String].toString)
    UTF8String.fromString(m.replaceFirst(lastRepJava))
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(subject = newFirst, regexp = newSecond, rep = newThird)

  override def prettyName: String = "regexp_replace_first"
}

object RegexpReplaceFirst {
  /** Translate a PG replacement string to Java Matcher semantics: PG uses
    * `\N` back-references and `\&` for the whole match, treats `$` as a
    * literal, and `\\` as a literal backslash; Java uses `$N`, treats `\`
    * as an escape and bare `$` as a group reference (which would throw or
    * substitute a group for PG-sourced strings).
    */
  def pgReplacementToJava(pg: String): String = {
    val sb = new StringBuilder(pg.length + 8)
    var i = 0
    while (i < pg.length) {
      val ch = pg.charAt(i)
      if (ch == '\\' && i + 1 < pg.length) {
        val n = pg.charAt(i + 1)
        if (n >= '1' && n <= '9') sb.append('$').append(n)
        else if (n == '&') sb.append("$0")
        else if (n == '\\') sb.append("\\\\")
        else sb.append('\\').append('\\').append(n) // literal backslash + char
        i += 2
      } else if (ch == '$') { sb.append("\\$"); i += 1 }
      else if (ch == '\\') { sb.append("\\\\"); i += 1 } // trailing backslash
      else { sb.append(ch); i += 1 }
    }
    sb.toString
  }
}
