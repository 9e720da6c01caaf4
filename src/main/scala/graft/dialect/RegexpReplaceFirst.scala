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

  override def nullSafeEval(s: Any, p: Any, r: Any): Any = {
    val patStr = p.asInstanceOf[UTF8String].toString
    if (patStr != lastRegex) {
      lastRegex = patStr
      lastPattern = Pattern.compile(patStr)
    }
    val m = lastPattern.matcher(s.asInstanceOf[UTF8String].toString)
    UTF8String.fromString(m.replaceFirst(r.asInstanceOf[UTF8String].toString))
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(subject = newFirst, regexp = newSecond, rep = newThird)

  override def prettyName: String = "regexp_replace_first"
}
