package graft.plans

import graft.functions.FloatVecDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: in front of every `levenshtein(a, b) <= k` conjunct,
  * inject the necessary-but-cheap guard `abs(length(a) - length(b)) <= k`.
  *
  * Levenshtein distance is at least the length difference, so the guard
  * never changes results — but it is a codegen'd O(1) comparison where the
  * DP is O(len²), and on blocked fuzzy-join shapes most candidate pairs
  * fail the guard. Hand-written pipelines (TextOps.text_edit_distance) do
  * this manually; the rule gives every ad-hoc query the same protection.
  *
  * Idempotent by construction (required for the optimizer's fixpoint
  * batches): a conjunct whose guard is already present is left alone.
  */
object LevenshteinPrefilter extends Rule[LogicalPlan] with PredicateHelper {

  private def guardFor(lev: Levenshtein, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(lev.left), Length(lev.right))), k)

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val guards = conjuncts.flatMap {
        case LessThanOrEqual(lev: Levenshtein, k) =>
          val g = guardFor(lev, k)
          if (conjuncts.exists(_.semanticEquals(g))) None else Some(g)
        case LessThan(lev: Levenshtein, k) =>
          val g = LessThan(Abs(Subtract(Length(lev.left), Length(lev.right))), k)
          if (conjuncts.exists(_.semanticEquals(g))) None else Some(g)
        case _ => None
      }
      if (guards.isEmpty) f
      else Filter((guards ++ conjuncts).reduce(And), child)
  }
}

/** Session-extension entry point (`spark.sql.extensions=graft.plans.GraftExtensions`):
  * registers the [[LevenshteinPrefilter]] optimizer rule and the `vec_dot`
  * SQL function ([[graft.functions.FloatVecDot]]) at session build time.
  * Harness-built sessions get the same function via
  * `VecFunctions.register`, which writes to the session's function
  * registry directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => LevenshteinPrefilter)
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo("graft", "vec_dot"),
      (children: Seq[Expression]) => FloatVecDot(children(0), children(1))))
  }
}
