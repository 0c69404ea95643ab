package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the DECLARATIVE per-group top-k idiom —
  *
  * {{{
  *   df.withColumn("rn", row_number().over(Window.partitionBy(g).orderBy(o)))
  *     .filter($"rn" <= k)
  * }}}
  *
  * — into [[TopKPerGroupPlan]], so plain DataFrame/SQL code gets the
  * bounded-heap physical plan (map-side prune, k-bounded shuffle, no
  * WindowExec sort) without calling the [[TopK.perGroup]] facade. The
  * rank attribute of the Window node is reused as the plan's rank output,
  * so every downstream reference resolves unchanged.
  *
  * Fires only when the rewrite is provably equivalent:
  *  - exactly ONE window expression, and it is `row_number()` (rank/
  *    dense_rank admit > k rows on boundary ties — a size-k heap would be
  *    lossy; row_number's tie assignment is engine-arbitrary in both forms)
  *  - the window is partitioned (a global row_number has no group key;
  *    Spark's own WindowGroupLimit handles that single-task case)
  *  - the filter bounds the rank above by a positive integer literal
  *    (`rn <= k`, `rn < k`, `rn = 1`, or the mirrored forms); any other
  *    conjuncts survive as a residual Filter on top
  *  - at most one pass-through Project (bare attributes) sits between the
  *    Filter and the Window — the common `withColumn` shape after
  *    CollapseProject.
  *
  * Registered per-session via `experimental.extraOptimizations`
  * ([[TopK.install]]) or globally through `GraftExtensions`.
  */
class RowNumberTopKRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // Filter directly over the Window
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w, identity).getOrElse(f)
    // Filter over a pass-through Project over the Window
    case f @ Filter(cond, p @ Project(projectList, w: Window))
        if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      rewrite(cond, w, topk => p.copy(child = topk)).getOrElse(f)
  }

  private def rewrite(cond: Expression, w: Window,
                      wrap: LogicalPlan => LogicalPlan): Option[LogicalPlan] = w match {
    case Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
                partitionSpec, orderSpec, child, _)
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      val rn = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.flatMap(c => rankBound(c, rn).map(c -> _))
      bounds.headOption.collect { case (boundConjunct, k) if k > 0 =>
        // When installed via extraOptimizations this rule runs AFTER
        // InferWindowGroupLimit, which has already inserted a
        // WindowGroupLimit under the Window. Left in place it would force
        // the very sorts this operator removes (its physical partial/final
        // forms each require sorted input) — strip it; the heap subsumes
        // the group limit.
        val realChild = child match {
          case wgl: WindowGroupLimit => wgl.child
          case c => c
        }
        val topk = TopKPerGroupPlan(partitionSpec, orderSpec, k,
          rn.asInstanceOf[AttributeReference], realChild)
        val residual = conjuncts.filterNot(_ eq boundConjunct)
        val wrapped = wrap(topk)
        if (residual.isEmpty) wrapped else Filter(residual.reduce(And), wrapped)
      }
    case _ => None
  }

  /** `k` such that the predicate is exactly `rank <= k` (in any spelling).
    * The strict forms guard `v - 1` against Int.MinValue wraparound — an
    * always-false `rn < Int.MinValue` must stay unrewritten, not become
    * top-Int.MaxValue-per-group.
    */
  private def rankBound(c: Expression, rn: Attribute): Option[Int] = c match {
    case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) => Some(v)
    case LessThan(a: AttributeReference, Literal(v: Int, IntegerType)) if a.semanticEquals(rn) && v > Int.MinValue => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: AttributeReference) if a.semanticEquals(rn) => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: AttributeReference) if a.semanticEquals(rn) && v > Int.MinValue => Some(v - 1)
    case EqualTo(a: AttributeReference, Literal(1, IntegerType)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(Literal(1, IntegerType), a: AttributeReference) if a.semanticEquals(rn) => Some(1)
    case _ => None
  }
}
