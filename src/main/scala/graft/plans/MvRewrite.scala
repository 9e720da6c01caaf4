package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, lit, when}
import org.apache.spark.sql.types.LongType

/** Transparent materialized-view rewrite — the optimizer half of the
  * incremental-view-maintenance story (q91 maintains grouped COUNT/SUM
  * views purely from a table's change feed; this rule makes the engine
  * USE them): an `Aggregate` over a registered base table whose
  * grouping columns are a subset of the view's grain and whose
  * aggregates are derivable from the view's partials (count(*) →
  * SUM(view.n); sum(x) → SUM(view.sum_x)) is rewritten to aggregate
  * the VIEW — at 100 TB that turns a full fact scan into a read of a
  * grain-sized summary. Decimal/integer partials re-aggregate
  * order-independently, so the rewrite is result-invisible (the q81
  * discipline: the oracle checks the rewritten query against the plain
  * form).
  *
  * Scope is deliberately the provable core: bare COUNT(1)/SUM(column)
  * aggregates (no DISTINCT, no filter clauses) over a plain scan, a
  * grain-column Filter of it, or a column-pruning projection of either;
  * anything else — including AVG, whose Spark result type/rounding
  * differs from SUM/COUNT division — falls through untouched. A Filter
  * whose predicate references only grain columns is remapped onto the
  * view (grain values are carried verbatim, so the predicate selects
  * exactly the same groups).
  *
  * Freshness comes in two flavors:
  *   - plain [[MvRegistry.MvDef]]: the registrant's contract is "the
  *     view is current" (register after each view sync; the CDC
  *     frontier markers make staleness decidable) — exactly like every
  *     MV-rewrite system;
  *   - with a [[MvRegistry.CompDef]]: the view may be STALE up to its
  *     recorded feed frontier, and the rewrite COMPENSATES — it unions
  *     the view's partials with signed per-row contributions from the
  *     change-feed batches past the frontier (insert/update_post → +1,
  *     update_pre/delete → −1; the q91 fold as a query-time plan
  *     fragment) and aggregates once. Groups whose net row count is
  *     zero (fully deleted in the tail) are dropped by a hidden
  *     HAVING net > 0, so the answer is exactly the fresh base
  *     aggregate. At 100 TB the query reads |grain| + |feed tail|
  *     rows instead of the fact table.
  *
  * Register rules on a live session via
  * `spark.experimental.extraOptimizations :+= MvRewrite(spark)` (the
  * [[RewriteDotProduct]] pattern); extraOptimizations run after the
  * main optimizer batches, so column pruning has already shaped the
  * child this rule matches. (File scans injected by the rewrite still
  * get column pruning + predicate pushdown: for V1 parquet relations
  * both are derived from the Project/Filter above the relation at
  * physical-planning time, not by the optimizer batches.)
  */
object MvRegistry {

  /** The stale-view compensation contract: `feedRoot` is the change
    * feed directory (per-batch `batch=<id>/` subdirs, the
    * mergeByKeyCdc layout) of the BASE table, and `frontier` is the
    * last batch id folded into the view. Feed rows must carry the
    * view's grain and measure columns (they do: the feed carries full
    * row images). Retention interaction: compensation reads only
    * batches PAST the frontier, so `truncateChangeFeed` of applied
    * batches (ids ≤ frontier) never affects it — the registered
    * frontier is exactly the low-water mark this consumer contributes.
    */
  final case class CompDef(feedRoot: String, frontier: Long)

  /** `mvPath` holds rows at grain `groupCols` with an additive row
    * count `countCol` and per-measure sums `sumCols` (base measure
    * column name → view sum column name).
    *
    * Optional extras widen the aggregate shapes the rewrite serves:
    *   - `minCols`/`maxCols`: per-grain extrema columns — MIN/MAX
    *     re-aggregate exactly from grain partials (min of mins), but
    *     only on a CURRENT view: extrema cannot be compensated from a
    *     feed tail that may carry deletes/updates, so queries using
    *     them fall through whenever `comp` is set.
    *   - `nonNullMeasures`: measures the registrant asserts are never
    *     NULL in the base. AVG(x) needs the non-null count of x, which
    *     equals the row count only under that assertion — AVG rewrites
    *     only for DECIMAL measures listed here (decimal sums are exact
    *     on both paths; a double/integral AVG accumulates IEEE sums
    *     row-by-row in the base and could differ from the re-folded
    *     partials by rounding, so it falls through).
    */
  final case class MvDef(mvPath: String, groupCols: Set[String],
      sumCols: Map[String, String], countCol: String,
      comp: Option[CompDef] = None,
      minCols: Map[String, String] = Map.empty,
      maxCols: Map[String, String] = Map.empty,
      nonNullMeasures: Set[String] = Set.empty)

  private val reg =
    scala.collection.concurrent.TrieMap.empty[String, Seq[MvDef]]

  private def qualify(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.makeQualified(p).toString
  }

  def register(spark: SparkSession, basePath: String, mv: MvDef): Unit =
    register(spark, basePath, Seq(mv))

  /** Register SEVERAL views over one base (different grains — the
    * classic summary lattice). The rewrite tries them COARSEST first
    * (fewest grain columns ≈ fewest rows) and takes the first that can
    * answer, so a `GROUP BY region` lands on the region view while
    * `GROUP BY region, day` falls to the finer one.
    */
  def register(spark: SparkSession, basePath: String, mvs: Seq[MvDef]): Unit = {
    require(mvs.nonEmpty, "register needs at least one view")
    reg.put(qualify(spark, basePath),
      mvs.map(mv => mv.copy(mvPath = qualify(spark, mv.mvPath)))
        .sortBy(_.groupCols.size))
  }

  def deregister(spark: SparkSession, basePath: String): Unit =
    reg.remove(qualify(spark, basePath))

  private[plans] def find(rootPaths: Seq[String]): Seq[MvDef] =
    rootPaths match {
      case Seq(one) => reg.getOrElse(one, Seq.empty)
      case _ => Seq.empty // multi-root scans are never a registered base
    }
}

case class MvRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  // names the rewrite standardizes the partials frame onto (prefixed to
  // stay clear of any user grain column)
  private val cntCol = "__mv_cnt"
  private def sumCol(measure: String) = s"__mv_sum_$measure"
  private def minC(measure: String) = s"__mv_min_$measure"
  private def maxC(measure: String) = s"__mv_max_$measure"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(grouping, aggExprs, child, _) =>
      rewriteAggregate(grouping, aggExprs, child).getOrElse(agg)
  }

  /** The star-schema join context: the aggregate sits over
    * `base INNER JOIN dim` and the dim side is kept VERBATIM (same
    * attribute ids, already optimized) — only the base side is swapped
    * for the partials. This is exact WITHOUT any dim-uniqueness
    * contract: the join condition may only reference GRAIN columns on
    * the base side, so every base row of a grain matches the same dim
    * rows (multiplicity m_g per grain) — COUNT partials scale to
    * cnt_g·m_g through the join exactly as the base rows would, SUM
    * partials likewise, and MIN/MAX are duplication-invariant.
    */
  private case class JoinCtx(dimPlan: LogicalPlan, joinCond: Expression,
      hint: org.apache.spark.sql.catalyst.plans.logical.JoinHint,
      baseOutput: AttributeSet, dimOutput: AttributeSet)

  private def relationRoots(plan: LogicalPlan): Seq[String] = plan.collect {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
      case _ => Seq.empty[String]
    }
  }.flatten

  private def rewriteAggregate(grouping: Seq[Expression],
      aggExprs: Seq[NamedExpression], child: LogicalPlan)
      : Option[LogicalPlan] = child match {
    // a pure column-pruning Project between the aggregate and the join
    // (what ColumnPruning leaves) is transparent: every attribute it
    // passes is unchanged, so grouping/aggregates resolve against the
    // join directly
    case Project(projList, inner)
        if projList.forall(_.isInstanceOf[AttributeReference])
          && inner.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join] =>
      rewriteAggregate(grouping, aggExprs, inner)
    case org.apache.spark.sql.catalyst.plans.logical.Join(
        l, r, org.apache.spark.sql.catalyst.plans.Inner, Some(cond), hint)
        if cond.deterministic =>
      def attempt(basePlan: LogicalPlan, dimPlan: LogicalPlan)
          : Option[LogicalPlan] =
        baseShapeOf(basePlan).flatMap { case (roots, bc) =>
          // a self-join (dim side also scans the base) is out of scope
          if (relationRoots(dimPlan).exists(roots.contains)) None
          else MvRegistry.find(roots).view.flatMap(mv =>
            tryRewriteSafely(grouping, aggExprs, bc, mv,
              Some(JoinCtx(dimPlan, cond, hint,
                basePlan.outputSet, dimPlan.outputSet)))).headOption
        }
      attempt(l, r).orElse(attempt(r, l))
    case _ =>
      baseShapeOf(child).flatMap { case (roots, cond) =>
        // coarsest-first view selection: the first registered view (by
        // ascending grain width) that can answer wins
        MvRegistry.find(roots).view.flatMap(mv =>
          tryRewriteSafely(grouping, aggExprs, cond, mv, None)).headOption
      }
  }

  /** A registration whose view/feed files have gone missing (dropped
    * without deregistering — e.g. mid-REFRESH) must not kill the user's
    * query inside the optimizer: the base scan is always a correct
    * fallback. The refresh job itself must deregister around
    * maintenance anyway — otherwise its view-rebuild aggregate would be
    * rewritten to read the view being rebuilt.
    */
  private def tryRewriteSafely(grouping: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      filterCond: Option[Expression],
      mv: MvRegistry.MvDef,
      join: Option[JoinCtx]): Option[LogicalPlan] =
    try tryRewrite(grouping, aggExprs, filterCond, mv, join)
    catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"MV rewrite for ${mv.mvPath} failed; " +
          s"falling back to the base scan: ${e.getMessage}")
        None
    }

  /** The base-table shapes the rule accepts: the scan itself, an
    * optional Filter directly above it, and an optional pure
    * column-pruning Project above either (what ColumnPruning +
    * PushDownPredicates leave by the time extraOptimizations run).
    * Returns the scan roots plus the filter condition, if any.
    */
  private def baseShapeOf(plan: LogicalPlan)
      : Option[(Seq[String], Option[Expression])] = {
    def roots(lr: LogicalRelation): Option[Seq[String]] = lr.relation match {
      case fs: HadoopFsRelation => Some(fs.location.rootPaths.map(_.toString))
      case _ => None
    }
    plan match {
      case lr: LogicalRelation => roots(lr).map((_, None))
      case Filter(cond, lr: LogicalRelation) if cond.deterministic =>
        roots(lr).map((_, Some(cond)))
      case Project(projList, inner) if projList.forall(_.isInstanceOf[AttributeReference]) =>
        inner match {
          case lr: LogicalRelation => roots(lr).map((_, None))
          case Filter(cond, lr: LogicalRelation) if cond.deterministic =>
            roots(lr).map((_, Some(cond)))
          case _ => None
        }
      case _ => None
    }
  }

  /** The partials frame the rewritten aggregate folds: the view's rows
    * under standardized names, plus — when a compensation contract is
    * registered — one signed row per change-feed row past the view's
    * frontier. Everything additive: COUNT partials are ±1L / view
    * counts, SUM partials are ±measure / view sums, all cast to the
    * view's own sum types so the union is exact.
    */
  private def partialsFrame(mv: MvRegistry.MvDef): DataFrame = {
    val grain = mv.groupCols.toSeq.sorted
    val viewRaw = spark.read.parquet(mv.mvPath)
    // extrema columns only ride the comp-free path (they cannot be
    // compensated); with comp set, Min/Max queries fall through before
    // this frame is ever built
    val extrema =
      if (mv.comp.isDefined) Seq.empty
      else mv.minCols.toSeq.sortBy(_._1).map { case (m, s) =>
        col(s).as(minC(m))
      } ++ mv.maxCols.toSeq.sortBy(_._1).map { case (m, s) =>
        col(s).as(maxC(m))
      }
    val view = viewRaw.select(
      grain.map(col) ++
        Seq(col(mv.countCol).cast(LongType).as(cntCol)) ++
        mv.sumCols.toSeq.sortBy(_._1).map { case (m, s) =>
          col(s).as(sumCol(m))
        } ++ extrema: _*)
    mv.comp match {
      case None => view
      case Some(c) =>
        val tailDirs = feedBatchDirsPast(c)
        if (tailDirs.isEmpty) view
        else {
          val sumTypes = mv.sumCols.map { case (m, s) =>
            m -> viewRaw.schema(s).dataType
          }
          val tail = spark.read.parquet(tailDirs: _*)
          val pos = col("change_op").isin("insert", "update_post")
          val comp = tail.select(
            grain.map(col) ++
              Seq(when(pos, lit(1L)).otherwise(lit(-1L)).as(cntCol)) ++
              mv.sumCols.keys.toSeq.sorted.map { m =>
                when(pos, col(m)).otherwise(-col(m))
                  .cast(sumTypes(m)).as(sumCol(m))
              }: _*)
          view.unionByName(comp)
        }
    }
  }

  /** Bounded driver-side listing (one listStatus on the feed root):
    * the batch directories with id strictly past the view's frontier.
    */
  private def feedBatchDirsPast(c: MvRegistry.CompDef): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(c.feedRoot)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .filter(_.getPath.getName.stripPrefix("batch=").toLong > c.frontier)
      .map(_.getPath.toString).sorted
  }

  private def tryRewrite(grouping: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      filterCond: Option[Expression],
      mv: MvRegistry.MvDef,
      join: Option[JoinCtx]): Option[LogicalPlan] = {
    def fromDim(a: Attribute): Boolean = join.exists(_.dimOutput.contains(a))
    // grouping must be bare columns: dim-side columns pass through
    // verbatim, base-side columns must sit inside the view's grain
    val groupAttrs = grouping.collect { case a: AttributeReference => a }
    if (groupAttrs.size != grouping.size) return None
    if (!groupAttrs.forall(a => fromDim(a) || mv.groupCols.contains(a.name)))
      return None
    val groupNames =
      groupAttrs.filterNot(fromDim).map(_.name).toSet
    // a base-side filter may only touch grain columns (grain values are
    // carried verbatim into the partials, so the predicate transfers)
    if (filterCond.exists(c =>
        !c.references.forall(a => mv.groupCols.contains(a.name))))
      return None
    // the join condition: dim-side references stay; base-side
    // references must be grain columns (the multiplicity argument in
    // [[JoinCtx]]'s doc needs every base row of a grain to join alike)
    if (join.exists(j => !j.joinCond.references.forall(a =>
        fromDim(a) || (j.baseOutput.contains(a) && mv.groupCols.contains(a.name)))))
      return None

    // fresh analyzed scan of the partials (fresh exprIds per rewrite —
    // safe under self-joins / repeated rewrites in one plan)
    val partials = partialsFrame(mv).queryExecution.analyzed
    def pAttr(name: String): AttributeReference =
      partials.output.collectFirst {
        case a: AttributeReference if a.name == name => a
      }.getOrElse(throw new IllegalStateException(
        s"MV ${mv.mvPath} partials lack column $name"))

    def sumOf(col: AttributeReference): Expression =
      AggregateExpression(Sum(col), Complete, isDistinct = false)
    def aggOf(f: AggregateFunction): Expression =
      AggregateExpression(f, Complete, isDistinct = false)
    // SUM/AVG rewrites only for exactly-additive types: decimal and
    // integral partials re-fold to the identical value under any
    // grouping; double sums are order-dependent IEEE folds and the
    // re-folded partials could differ from the base's row fold in the
    // last ulp — those fall through to the base scan
    def additive(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.DecimalType => true
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }

    // every output must be a grouped column or a derivable aggregate:
    // COUNT(1), SUM/MIN/MAX(measure), AVG(declared non-null decimal);
    // with a join, dim-side grouped columns and dim-side MIN/MAX pass
    // through verbatim (duplication-invariant), while SUM/AVG over a
    // dim column is NOT derivable (each view row carries cnt_g base
    // rows, but a dim value would be folded only once per match) and
    // falls through
    val rewritten: Seq[Option[NamedExpression]] = aggExprs.map {
      case a: AttributeReference if fromDim(a) => Some(a)
      case al @ Alias(a: AttributeReference, _) if fromDim(a) => Some(al)
      case al @ Alias(
          AggregateExpression(Min(a: AttributeReference), Complete, false, None, _), _)
          if fromDim(a) => Some(al)
      case al @ Alias(
          AggregateExpression(Max(a: AttributeReference), Complete, false, None, _), _)
          if fromDim(a) => Some(al)
      case a: AttributeReference if groupNames.contains(a.name) =>
        Some(Alias(pAttr(a.name), a.name)(exprId = a.exprId))
      case al @ Alias(a: AttributeReference, name)
          if groupNames.contains(a.name) && !fromDim(a) =>
        Some(Alias(pAttr(a.name), name)(exprId = al.exprId))
      case al @ Alias(
          AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _),
          name) =>
        // COUNT(*) over base == Σ partial counts; empty-partials global
        // aggregates must still yield 0, and the original Count is
        // non-nullable
        val s = Coalesce(Seq(sumOf(pAttr(cntCol)), Literal(0L)))
        Some(Alias(castTo(s, al.dataType), name)(exprId = al.exprId))
      case al @ Alias(
          AggregateExpression(Count(Seq(attr: AttributeReference)), Complete, false, None, _),
          name) if !fromDim(attr) && mv.nonNullMeasures.contains(attr.name) =>
        // COUNT(col) counts non-nulls == the row count under the
        // registrant's non-null assertion — same derivation as COUNT(*)
        val s = Coalesce(Seq(sumOf(pAttr(cntCol)), Literal(0L)))
        Some(Alias(castTo(s, al.dataType), name)(exprId = al.exprId))
      case al @ Alias(
          AggregateExpression(Sum(attr: AttributeReference, _), Complete, false, None, _),
          name) if !fromDim(attr) && mv.sumCols.contains(attr.name)
            && additive(al.dataType) =>
        val s = sumOf(pAttr(sumCol(attr.name)))
        Some(Alias(castTo(s, al.dataType), name)(exprId = al.exprId))
      case al @ Alias(
          AggregateExpression(Min(attr: AttributeReference), Complete, false, None, _),
          name) if !fromDim(attr) && mv.minCols.contains(attr.name)
            && mv.comp.isEmpty =>
        val s = aggOf(Min(pAttr(minC(attr.name))))
        Some(Alias(castTo(s, al.dataType), name)(exprId = al.exprId))
      case al @ Alias(
          AggregateExpression(Max(attr: AttributeReference), Complete, false, None, _),
          name) if !fromDim(attr) && mv.maxCols.contains(attr.name)
            && mv.comp.isEmpty =>
        val s = aggOf(Max(pAttr(maxC(attr.name))))
        Some(Alias(castTo(s, al.dataType), name)(exprId = al.exprId))
      case al @ Alias(
          AggregateExpression(avg @ Average(attr: AttributeReference, _), Complete, false, None, _),
          name) if !fromDim(attr) && mv.sumCols.contains(attr.name)
            && mv.nonNullMeasures.contains(attr.name)
            && attr.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType] =>
        // AVG(x) = Average's own final-projection expression with its
        // sum/count buffer slots substituted by the re-folded partials:
        // the division arithmetic is literally the one Spark lowers
        // Average to, over operand VALUES equal to the base's (exact
        // decimal sum; count == non-null count under the registrant's
        // nonNullMeasures assertion) — bit-equal by construction
        val totalSum = castTo(sumOf(pAttr(sumCol(attr.name))), avg.sum.dataType)
        val totalCnt = Coalesce(Seq(sumOf(pAttr(cntCol)), Literal(0L)))
        val e = avg.evaluateExpression.transform {
          case a: AttributeReference if a.exprId == avg.sum.exprId => totalSum
          case a: AttributeReference if a.exprId == avg.count.exprId => totalCnt
        }
        Some(Alias(castTo(e, al.dataType), name)(exprId = al.exprId))
      case _ => None
    }
    if (rewritten.exists(_.isEmpty)) return None

    val filtered: LogicalPlan = filterCond match {
      case None => partials
      case Some(cond) =>
        val remapped = cond.transform {
          case a: AttributeReference => pAttr(a.name)
        }
        Filter(remapped, partials)
    }
    val rewrittenChild: LogicalPlan = join match {
      case None => filtered
      case Some(j) =>
        val remappedCond = j.joinCond.transform {
          case a: AttributeReference if !fromDim(a) => pAttr(a.name)
        }
        org.apache.spark.sql.catalyst.plans.logical.Join(
          filtered, j.dimPlan, org.apache.spark.sql.catalyst.plans.Inner,
          Some(remappedCond), j.hint)
    }
    val newGrouping: Seq[Expression] =
      groupAttrs.map(a => if (fromDim(a)) a else pAttr(a.name))
    val outs = rewritten.flatten

    mv.comp match {
      case None =>
        Some(Aggregate(newGrouping, outs, rewrittenChild))
      case Some(_) if groupAttrs.isEmpty =>
        // a global aggregate keeps its single row even when the table
        // nets to empty (COUNT returns 0) — no HAVING guard
        Some(Aggregate(newGrouping, outs, rewrittenChild))
      case Some(_) =>
        // compensated GROUPED aggregate: a group fully deleted in the
        // feed tail nets to zero rows and must vanish from the result,
        // exactly as it would from the base aggregate — HAVING net > 0
        // via a hidden count column, projected away with the original
        // output exprIds preserved
        val net = Alias(
          Coalesce(Seq(sumOf(pAttr(cntCol)), Literal(0L))), "__mv_net")()
        val withNet = Aggregate(newGrouping, outs :+ net, rewrittenChild)
        val having = Filter(GreaterThan(net.toAttribute, Literal(0L)), withNet)
        Some(Project(outs.map(_.toAttribute), having))
    }
  }

  /** Re-aggregated partials widen (sum of decimal(28,2) partials is
    * decimal(38,2); the original sum over raw rows was (28,2)) — cast
    * back so downstream references keep their resolved types. Values
    * are unchanged: the view's partials sum to exactly the base sum.
    */
  private def castTo(e: Expression, dt: org.apache.spark.sql.types.DataType)
      : Expression =
    if (e.dataType == dt) e
    else Cast(e, dt, Option(spark.sessionState.conf.sessionLocalTimeZone))
}
