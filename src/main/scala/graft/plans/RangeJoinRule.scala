package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite a naive range (interval) theta-join into the
  * bucketized equi-join of [[graft.operators.RangeJoin]] — so a user
  * who writes the natural
  * {{{ points.join(intervals, $"pv" >= $"lo" && $"pv" <= $"hi") }}}
  * (or SQL `BETWEEN`) gets the one-shuffle plan instead of Spark's
  * BroadcastNestedLoopJoin, without changing their query.
  *
  * Matches an INNER join whose condition is exactly the two range
  * conjuncts — `pv ≥ lo ∧ pv ≤ hi` in any orientation — with `pv` an
  * integral expression over one side and `lo`/`hi` integral
  * expressions over the other. Rewrites to:
  *
  * {{{
  * Project(originalOutput,
  *   Join(point ∪ {__graft_pb = floor(pv/w)},
  *        Generate(explode(sequence(floor(lo/w), floor(hi/w))),
  *                 Filter(NOT lo > hi, intervals)),
  *        Inner, __graft_pb = __graft_ib ∧ originalCondition))
  * }}}
  *
  * The bucket equality makes the join plannable as a hash join; the
  * original condition rides along as the residual filter. Intervals
  * with null or inverted bounds are filtered before `sequence` (they
  * cannot match the theta-join either, so inner-join semantics are
  * preserved — and `sequence(start > stop)` would otherwise throw).
  * The rewritten condition contains an equality conjunct, which the
  * matcher rejects, so the rule never re-fires on its own output.
  *
  * Width comes from `spark.graft.rangejoin.width` (session conf,
  * default 512). Enable per session via
  * [[GraftExtensions.enableRangeJoinRewrite]] or for new sessions via
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  private val WidthKey = "spark.graft.rangejoin.width"

  private def fdiv(e: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Normalize a conjunct to (pv, bound) if it is a lower/upper range
    * comparison. Returns (pv, bound, isLower). */
  private def asBound(e: Expression): Option[(Expression, Expression, Boolean)] = e match {
    case GreaterThanOrEqual(a, b) => Some((a, b, true))  // a >= b: a ≥ lo
    case LessThanOrEqual(a, b) => Some((a, b, false))    // a <= b: a ≤ hi
    case _ => None
  }

  def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthKey, "512").toLong
    if (width <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(And(c1, c2)), hint) =>
        rewrite(j, left, right, c1, c2, hint, width).getOrElse(j)
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      c1: Expression, c2: Expression,
                      hint: JoinHint, width: Long): Option[LogicalPlan] = {
    // each conjunct must be a range comparison; orient them so we have
    // one lower bound and one upper bound on the SAME pv expression
    val (b1, b2) = (asBound(c1), asBound(c2)) match {
      case (Some(x), Some(y)) => (x, y)
      case _ => return None
    }
    // four orientations: (pv ≥ lo, pv ≤ hi), (pv ≥ lo, hi ≥ pv), ...
    // normalize both to "pv cmp bound" by flipping when pv sits on the
    // bound side (lo ≤ pv is pv ≥ lo; hi ≥ pv is pv ≤ hi)
    def orientations(b: (Expression, Expression, Boolean)) = Seq(
      (b._1, b._2, b._3),          // as written
      (b._2, b._1, !b._3))         // flipped
    val candidates = for {
      (pv1, lo, low1) <- orientations(b1) if low1
      (pv2, hi, low2) <- orientations(b2) if !low2
      if pv1.semanticEquals(pv2)
    } yield (pv1, lo, hi)
    val (pv, lo, hi) = candidates.headOption.getOrElse(return None)
    if (!integral(pv) || !integral(lo) || !integral(hi)) return None

    // pv over one child, bounds over the other (both bounds same side)
    val (pointPlan, intervalPlan) =
      if (pv.references.subsetOf(left.outputSet) &&
          (lo.references ++ hi.references).subsetOf(right.outputSet) &&
          pv.references.nonEmpty && (lo.references ++ hi.references).nonEmpty)
        (left, right)
      else if (pv.references.subsetOf(right.outputSet) &&
               (lo.references ++ hi.references).subsetOf(left.outputSet) &&
               pv.references.nonEmpty && (lo.references ++ hi.references).nonEmpty)
        (right, left)
      else return None

    val pb = Alias(fdiv(pv, width), "__graft_pb")()
    val pointProj = Project(pointPlan.output :+ pb, pointPlan)
    // inverted/null bounds cannot match and would break sequence()
    val safeIntervals = Filter(Not(GreaterThan(lo, hi)), intervalPlan)
    // Sequence is TimeZoneAware: without an explicit zone the new node
    // is unresolved and fails the optimizer's plan validation
    val gen = Explode(Sequence(fdiv(lo, width), fdiv(hi, width),
      Some(Literal(1L)), Some(conf.sessionLocalTimeZone)))
    val ibAttr = gen.elementSchema.headOption match {
      case Some(f) => AttributeReference("__graft_ib", f.dataType, f.nullable)()
      case None => return None
    }
    val genPlan = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(ibAttr), child = safeIntervals)
    val newJoin = Join(pointProj, genPlan, Inner,
      Some(And(EqualTo(pb.toAttribute, ibAttr), j.condition.get)), hint)
    Some(Project(j.output, newJoin))
  }
}
