package graft.operators

import graft.functions.AhoCorasick
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import java.util.regex.Pattern

/** A many-branch ordered ILIKE classifier as ONE Catalyst expression.
  *
  * The declarative alternative — a CaseWhen with hundreds of branches and
  * ~600 LIKE predicates (the shape of reference
  * models/card_merchants_model.sql:2-620) — is correct but costs the driver
  * seconds per query: every optimizer rule walks a ~2500-node tree, and the
  * generated code falls out of whole-stage codegen budgets. Holding the
  * branch table as *data* inside one expression node keeps the plan tiny
  * and the row path fast:
  *
  *  - each ILIKE pattern compiles to the same regex Spark's own LIKE uses
  *    (`%` → `.*`, `_` → `.`, literals quoted, DOTALL), case-insensitivity
  *    by lowering both sides once;
  *  - an [[AhoCorasick]] scan over each branch's required literal (longest
  *    wildcard-free segment) selects the candidate branches, so a typical
  *    row full-matches only a handful of patterns instead of walking every
  *    branch — the same prefilter architecture as [[RegexBank]];
  *  - [[IlikeChainMatch]] participates in whole-stage codegen via a single
  *    static call (`doGenCode`), unlike a Scala UDF.
  *
  * Branch order is evaluation order (first match wins), matching CASE WHEN
  * shadowing semantics exactly.
  */
object IlikeChain {

  /** One `[not] ilike` term; `pattern` must already be lowercased. */
  final case class Term(pattern: String, negated: Boolean)

  /** One branch: OR across conjunctions, AND within, → `result`. */
  final case class Branch(cond: Array[Array[Term]], result: String)

  /** Spark-LIKE semantics as a regex (no escape char — callers guarantee
    * pattern text contains no backslashes): `%` → `.*`, `_` → `.`,
    * everything else literal; DOTALL so `%` spans newlines, full anchoring
    * via `matches()`.
    */
  private[graft] def likeToRegex(pattern: String): String = {
    val sb = new StringBuilder("(?s)")
    val lit = new StringBuilder
    def flush(): Unit = if (lit.nonEmpty) { sb.append(Pattern.quote(lit.toString)); lit.clear() }
    pattern.foreach {
      case '%' => flush(); sb.append(".*")
      case '_' => flush(); sb.append('.')
      case c => lit.append(c)
    }
    flush()
    sb.toString
  }

  /** Longest wildcard-free run of a pattern — the necessary literal for the
    * prefilter. Empty when the pattern is all wildcards.
    */
  private[graft] def requiredLiteral(pattern: String): String =
    pattern.split("[%_]").foldLeft("")((best, s) => if (s.length > best.length) s else best)

  final class CompiledChain(branches: Array[Branch], default: String)
      extends Serializable {

    /** All row-path state is rebuilt lazily per JVM (Pattern/UTF8String
      * aren't serialization-friendly).
      */
    @transient private lazy val st: State = new State
    private final class State {
      val compiled: Array[Array[Array[(Pattern, Boolean)]]] =
        branches.map(_.cond.map(_.map(t =>
          (Pattern.compile(likeToRegex(t.pattern)), t.negated))))
      val results: Array[UTF8String] =
        branches.map(b => UTF8String.fromString(b.result))
      val defaultU8: UTF8String = UTF8String.fromString(default)

      // prefilter: per branch, every conjunction must contribute one
      // positive-term literal, else the branch is unconditionally checked
      val litPatterns = scala.collection.mutable.ArrayBuffer.empty[String]
      val litBranch = scala.collection.mutable.ArrayBuffer.empty[Int]
      val always = new java.util.BitSet(branches.length)
      branches.zipWithIndex.foreach { case (b, i) =>
        val lits = b.cond.map { conj =>
          conj.find(!_.negated).map(t => requiredLiteral(t.pattern)).getOrElse("")
        }
        if (lits.exists(l => l.isEmpty || l.exists(_ >= 128))) always.set(i)
        else lits.foreach { l => litPatterns += l; litBranch += i }
      }
      val litBranchArr: Array[Int] = litBranch.toArray
      val prefilter = new AhoCorasick(litPatterns.toArray)
    }

    def numAlwaysChecked: Int = st.always.cardinality()

    /** CASE-WHEN null semantics: a null input satisfies no branch and falls
      * through to the ELSE default (matching the declarative chain and the
      * reference SQL), rather than propagating null.
      */
    def defaultOrMatch(u: UTF8String): UTF8String =
      if (u == null) st.defaultU8 else bestMatch(u)

    /** First matching branch's result over the raw (unlowered) input. */
    def bestMatch(u: UTF8String): UTF8String = {
      val s = st
      val low = u.toString.toLowerCase(java.util.Locale.ROOT)
      val litBits = new java.util.BitSet(s.litBranchArr.length)
      s.prefilter.collectInto(low, litBits)
      val cand = new java.util.BitSet(branches.length)
      var b = litBits.nextSetBit(0)
      while (b >= 0) { cand.set(s.litBranchArr(b)); b = litBits.nextSetBit(b + 1) }
      cand.or(s.always)
      var i = cand.nextSetBit(0)
      while (i >= 0) {
        val conds = s.compiled(i)
        var c = 0
        while (c < conds.length) {
          val conj = conds(c)
          var t = 0
          var ok = true
          while (ok && t < conj.length) {
            val (p, neg) = conj(t)
            if (p.matcher(low).matches() == neg) ok = false
            t += 1
          }
          if (ok) return s.results(i)
          c += 1
        }
        i = cand.nextSetBit(i + 1)
      }
      s.defaultU8
    }
  }

  /** Scalar expression: description → first-matching branch result. Never
    * null — a null description takes the ELSE default, like the CASE WHEN
    * it replaces.
    */
  case class IlikeChainMatch(child: Expression, chain: CompiledChain)
      extends UnaryExpression {

    override def dataType: DataType = StringType
    override def nullable: Boolean = false

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
      chain.defaultOrMatch(child.eval(input).asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
      val ref = ctx.addReferenceObj("ilikeChain", chain,
        classOf[CompiledChain].getName)
      val childGen = child.genCode(ctx)
      ev.copy(
        code = code"""
          ${childGen.code}
          UTF8String ${ev.value} = $ref.defaultOrMatch(
            ${childGen.isNull} ? null : ${childGen.value});
        """,
        isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)

    override def prettyName: String = "ilike_chain_match"
  }

  /** Column form. */
  def matchCol(c: Column, chain: CompiledChain): Column = {
    import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
    column(IlikeChainMatch(expression(c), chain))
  }
}
