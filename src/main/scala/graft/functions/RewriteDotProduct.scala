package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the composable dot-product idiom
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x)`
  * into the fused codegen'd [[DotProduct]] expression.
  *
  * Why a Rule rather than asking callers to use `graft_dot`: the composable
  * form is what users naturally write (and what arrives through SQL or
  * saved plans); the two HOF interpreters allocate an intermediate products
  * array per row, which is the difference between interpreter-bound and
  * scan-bound ANN scoring. The rewrite is exactly semantics-preserving —
  * DotProduct implements the same strict left-to-right fold with the same
  * NULL contract (FunctionsSpec asserts parity on random vectors, and the
  * rewrite-fires test asserts equal results with the rule on).
  *
  * Registered by [[GraftExtensions]] via `injectOptimizerRule`; ad-hoc
  * sessions can add it with `spark.experimental.extraOptimizations`.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case n: NamedLambdaVariable => n.exprId == v.exprId
    case _ => false
  }

  // containsNull must be false: DotProduct reads null slots as 0.0 via
  // ArrayData.getDouble, while the composable fold nulls the whole result —
  // rewriting a nullable-element array would turn NULL into a wrong number
  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(mx, my, _),
              Seq(zx: NamedLambdaVariable, zy: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(Add(macc, mel, _),
            Seq(lacc: NamedLambdaVariable, lel: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if zero == 0.0 &&
          isVar(mx, zx) && isVar(my, zy) &&
          isVar(macc, lacc) && isVar(mel, lel) && isVar(fin, fv) &&
          isDoubleArray(a) && isDoubleArray(b) =>
      DotProduct(a, b)
  }
}
