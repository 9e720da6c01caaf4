package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: recognizes the idiomatic higher-order-function dot
  * product `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) -> acc+v)`
  * anywhere in a plan and rewrites it to the codegen'd [[DotProduct]]
  * expression — users who write the HOF form get the tight generated loop
  * for free. Summation order is identical (left-to-right fold), so the
  * rewrite is result-preserving bit-for-bit.
  *
  * Register via `spark.experimental.extraOptimizations` on a live session
  * or [[graft.GraftExtensions]] (injectOptimizerRule) at build time.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private object HofDot {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
                Seq(ax: NamedLambdaVariable, ay: NamedLambdaVariable), _)),
            Literal(zero: Double, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _),
              Seq(aAcc: NamedLambdaVariable, aV: NamedLambdaVariable), _),
            finishLambda)
          // the multiply/add must consume exactly the lambda's own two
          // distinct arguments in order — x*x or v+v is NOT a dot product
          if zero == 0.0 && isIdentity(finishLambda)
            && x.exprId == ax.exprId && y.exprId == ay.exprId
            && acc.exprId == aAcc.exprId && v.exprId == aV.exprId =>
        Some((a, b))
      case _ => None
    }

    private def isIdentity(l: Expression): Boolean = l match {
      case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
        body.exprId == arg.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case HofDot(a, b) => DotProduct(a, b)
    }
}
