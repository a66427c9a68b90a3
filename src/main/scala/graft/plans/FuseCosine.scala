package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.CosineSim

/** Optimizer rule: fuse the composed cosine-similarity pattern
  *
  *   dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))
  *   where dot(x,y) = aggregate(zip_with(x, y, (p,q) -> p*q), 0.0, (acc,e) -> acc+e)
  *
  * into the native [[CosineSim]] expression (single fused loop, full
  * codegen). Users writing the idiomatic `functions._` composition
  * get native performance without knowing the expression exists —
  * result is bit-identical (same IEEE op order), so this is a pure
  * physical rewrite. Registered by [[GraftExtensions]] via
  * injectOptimizerRule.
  */
case class FuseCosine(unused: org.apache.spark.sql.SparkSession) extends Rule[LogicalPlan] {

  /** Matches aggregate(zip_with(x, y, mult), 0.0, add) → (x, y). */
  private object DotProduct {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
            ZipWith(x, y, LambdaFunction(Multiply(p: NamedLambdaVariable, q: NamedLambdaVariable, _), _, _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(acc: NamedLambdaVariable, el: NamedLambdaVariable, _), _, _),
            finish @ LambdaFunction(res: NamedLambdaVariable, _, _))
          if zero == 0.0 && finish.arguments.headOption.exists(_.exprId == res.exprId) &&
            Seq(p, q).map(_.exprId).toSet.size == 2 &&
            Seq(acc, el).map(_.exprId).toSet.size == 2 =>
        Some((x, y))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(
            DotProduct(a, b),
            Multiply(Sqrt(DotProduct(a2, a3)), Sqrt(DotProduct(b2, b3)), _), _)
          if a.semanticEquals(a2) && a.semanticEquals(a3) &&
            b.semanticEquals(b2) && b.semanticEquals(b3) =>
        CosineSim(a, b)
    }
}
