package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule — SURVEY.md §2 preference path (c): whole-plan
  * surgery registered via `SparkSessionExtensions.injectOptimizerRule`
  * (see [[graft.GraftExtensions]]).
  *
  * Rewrites an inner θ-join whose ONLY cross-side predicate is interval
  * containment — `p >= lo AND p <= hi` (any >=/> and <=/< mix), with the
  * point on one side and both bounds on the other — into the binned
  * equi-join `graft.ops.Relational.binnedRangeJoin` spells by hand:
  * the point side gains `bin = p DIV w`, the interval side explodes its
  * covered bins `sequence(lo DIV w, hi DIV w)`, and the join gains the
  * `bin = bin` equi conjunct while KEEPING the original predicate as the
  * residual filter. Without an equi conjunct Spark must plan
  * BroadcastNestedLoopJoin — O(|A|·|B|) and driver-bound for large×large;
  * with it, a shuffle hash/sort-merge join whose per-bin work is
  * |A∩bin|·|B∩bin|.
  *
  * Fires only when `spark.graft.binnedRangeJoin.width` is set to a
  * positive bin width (same units as the operands; pick it near the
  * typical interval length so each interval covers O(1) bins — a width
  * far below the interval length multiplies the exploded rows). Scope
  * guards, each preserving exact semantics:
  *  - inner joins, all three operands LongType (epoch seconds/ids);
  *  - no existing cross-side equality (already equi-plannable — and this
  *    also makes the rewrite's own output, which has one, a fixpoint);
  *  - interval rows with `lo > hi` or null bounds are pre-filtered on the
  *    interval side — under containment they can never match, and it
  *    keeps `sequence()` from throwing on reversed boundaries;
  *  - integer division is truncation, which is monotone, so
  *    p ∈ [lo, hi] ⇒ bin(p) ∈ [bin(lo), bin(hi)] regardless of sign.
  */
class BinnedRangeJoinRule extends Rule[LogicalPlan] {

  private val widthKey = "spark.graft.binnedRangeJoin.width"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** (point, bound, boundIsLower) readings of one comparison conjunct. */
  private def boundReadings(e: Expression): Seq[(Expression, Expression, Boolean)] = e match {
    case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
    case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
    case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
    case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
    case _ => Seq.empty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(widthKey, "0").toLong
    if (width <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) if j.resolved =>
        val cs = conjuncts(cond)
        def sideOf(e: Expression): Option[Boolean] = // Some(true)=left
          if (e.references.nonEmpty && e.references.subsetOf(left.outputSet)) Some(true)
          else if (e.references.nonEmpty && e.references.subsetOf(right.outputSet)) Some(false)
          else None
        val hasCrossEqui = cs.exists {
          case EqualTo(a, b) => sideOf(a).isDefined && sideOf(b).isDefined && sideOf(a) != sideOf(b)
          case _ => false
        }
        val pair = if (hasCrossEqui) None else {
          val readings = cs.flatMap(boundReadings).flatMap { case (p, b, isLower) =>
            (sideOf(p), sideOf(b)) match {
              case (Some(ps), Some(bs)) if ps != bs &&
                p.dataType == LongType && b.dataType == LongType =>
                Some((p, b, isLower, ps))
              case _ => None
            }
          }
          val lowers = readings.filter(_._3)
          val uppers = readings.filterNot(_._3)
          lowers.flatMap { case (p, lo, _, ps) =>
            uppers.collectFirst {
              case (p2, hi, _, ps2) if ps == ps2 && p.semanticEquals(p2) => (p, lo, hi, ps)
            }
          }.headOption
        }
        pair match {
          case None => j
          case Some((p, lo, hi, pointOnLeft)) =>
            val w = Literal(width, LongType)
            val binPoint = Alias(IntegralDivide(p, w), "_graft_bin")()
            val pointSide = if (pointOnLeft) left else right
            val intervalSide = if (pointOnLeft) right else left
            val pointProj = Project(pointSide.output :+ binPoint, pointSide)
            val binGenOut = AttributeReference("_graft_bin_i", LongType, nullable = false)()
            // Sequence is TimeZoneAwareExpression: the analyzer's
            // ResolveTimeZone has already run, so set the zone here or the
            // plan flips back to unresolved (PLAN_VALIDATION_FAILED)
            val gen = Generate(
              Explode(new Sequence(IntegralDivide(lo, w), IntegralDivide(hi, w),
                Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binGenOut),
              child = Filter(LessThanOrEqual(lo, hi), intervalSide))
            val newCond = And(EqualTo(binPoint.toAttribute, binGenOut), cond)
            val (nl, nr) = if (pointOnLeft) (pointProj, gen) else (gen, pointProj)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
        }
    }
  }
}
