package graft.plans

import scala.util.Try

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** Optimizer rule: rewrite a naive range (interval) theta-join into the
  * bucketized equi-join of [[graft.operators.RangeJoin]] — so a user
  * who writes the natural
  * {{{ points.join(intervals, $"pv" >= $"lo" && $"pv" <= $"hi") }}}
  * (or SQL `BETWEEN`) gets the one-shuffle plan instead of Spark's
  * BroadcastNestedLoopJoin, without changing their query.
  *
  * Matches an INNER join whose condition CONTAINS the two range
  * conjuncts — `pv ≥ lo ∧ pv ≤ hi` in any orientation, anywhere in a
  * larger conjunction — with `pv` an integral expression over one side
  * and `lo`/`hi` integral expressions over the other. Extra conjuncts
  * (the common `category = category ∧ pv BETWEEN lo AND hi` query) ride
  * along in the residual condition, where Catalyst's equi-join
  * extraction still turns equalities into hash-join keys alongside the
  * bucket. Rewrites to:
  *
  * {{{
  * Union(
  *   Project(originalOutput,                          // fast path
  *     Join(point ∪ {__graft_pb = floor(pv/w)},
  *          Generate(explode(sequence(floor(lo/w), floor(hi/w))),
  *                   Filter(lo ≤ hi ∧ fanout ≤ maxFanout, intervals)),
  *          Inner, __graft_pb = __graft_ib ∧ originalCondition)),
  *   Project(originalOutput,                          // guard path
  *     Join(point, Filter(fanout > maxFanout, intervals),
  *          Inner, originalCondition)))
  * }}}
  *
  * The bucket equality makes the fast-path join plannable as a hash
  * join; the original condition rides along as the residual filter.
  * Intervals with null or inverted bounds are filtered before
  * `sequence` (they cannot match the theta-join either, so inner-join
  * semantics are preserved — and `sequence(start > stop)` would
  * otherwise throw).
  *
  * '''Fan-out guard.''' `explode(sequence(lo/w, hi/w))` materializes
  * `(hi-lo)/w + 1` rows per interval; an interval spanning a wide value
  * domain at a small width (timestamps in micros at the default 512)
  * would generate billions of elements per row — `sequence` throws past
  * 2³¹ and memory dies long before. Intervals whose bucket fan-out
  * exceeds `spark.graft.rangejoin.maxFanout` (default 4096) therefore
  * keep the original nested-loop plan in the guard branch: slow but
  * bounded, exactly what the query did before the rule — the rewrite
  * can no longer convert a working query into a crashing one. When no
  * pathological interval exists at runtime (the usual case) the guard
  * branch's build side is empty and AQE's empty-relation propagation
  * collapses it, so the point side is NOT scanned twice. That
  * collapse IS an AQE behavior: with `spark.sql.adaptive.enabled=false`
  * the guard branch executes even when empty — one extra point-side
  * scan and an empty-build nested-loop per query. Still almost always
  * far cheaper than the pre-rewrite plan (a nested loop over ALL
  * intervals, not just the wide ones), but not free; keep AQE on
  * (Spark's default) where the rewrite is enabled.
  *
  * Both emitted joins carry a [[TreeNodeTag]] so the rule never
  * re-fires on its own output (the range conjuncts survive in the
  * residual condition and would otherwise match again).
  *
  * Width comes from `spark.graft.rangejoin.width` (session conf,
  * default 512; malformed values fall back to the default rather than
  * failing every plan on the session). Pick it against the interval
  * domain: width ≈ typical interval length keeps replication at a few
  * buckets per interval. Enable per session via
  * [[GraftExtensions.enableRangeJoinRewrite]] or for new sessions via
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val WidthKey = "spark.graft.rangejoin.width"
  private val FanoutKey = "spark.graft.rangejoin.maxFanout"

  /** Marks joins this rule emitted, so it never rewrites its own output. */
  private[graft] val SkipTag = TreeNodeTag[Unit]("graft.rangejoin.skip")

  private def confLong(key: String, default: Long): Long =
    Try(conf.getConfString(key, default.toString).toLong).getOrElse {
      logWarning(s"ignoring malformed $key; using $default")
      default
    }

  private def fdiv(e: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** Normalize a conjunct to (pv, bound, isLower) in both orientations
    * (`lo ≤ pv` is `pv ≥ lo`; `hi ≥ pv` is `pv ≤ hi`). */
  private def orientedBounds(e: Expression): Seq[(Expression, Expression, Boolean)] =
    e match {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b) => Seq((a, b, false), (b, a, true))
      case _ => Nil
    }

  def apply(plan: LogicalPlan): LogicalPlan = {
    val width = confLong(WidthKey, 512L)
    val maxFanout = confLong(FanoutKey, 4096L)
    if (width <= 0 || maxFanout <= 0) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.getTagValue(SkipTag).isEmpty =>
        rewrite(j, left, right, cond, hint, width, maxFanout).getOrElse(j)
    }
  }

  /** pv over one child, both bounds over the other → (point, interval). */
  private def sideOf(pv: Expression, lo: Expression, hi: Expression,
                     left: LogicalPlan, right: LogicalPlan): Option[(LogicalPlan, LogicalPlan)] = {
    val boundRefs = lo.references ++ hi.references
    if (pv.references.isEmpty || boundRefs.isEmpty) None
    else if (pv.references.subsetOf(left.outputSet) && boundRefs.subsetOf(right.outputSet))
      Some((left, right))
    else if (pv.references.subsetOf(right.outputSet) && boundRefs.subsetOf(left.outputSet))
      Some((right, left))
    else None
  }

  /** Structural belt for the GUARD branch (the fast path has
    * `__graft_` columns; the guard join does not): its interval child
    * is a Filter whose condition compares the rule's own fan-out
    * expression — `floor(hi/w) - floor(lo/w)` — against a literal. No
    * user writes that shape; if any Filter in the subtree carries it,
    * this join is rule output whose [[SkipTag]] a tag-dropping
    * case-class copy() lost, and re-firing would nest Unions each
    * fixed-point iteration (semantics survive — wide ∩ narrow = ∅ —
    * but the plan bloats until the batch hits max iterations). */
  private def hasFanoutGuard(plan: LogicalPlan, lo: Expression,
                             hi: Expression, width: Long): Boolean = {
    val fanout = Subtract(fdiv(hi, width), fdiv(lo, width))
    def guarded(c: Expression): Boolean = splitConjunctivePredicates(c).exists {
      case GreaterThan(f, _: Literal) => f.semanticEquals(fanout)
      case LessThanOrEqual(f, _: Literal) => f.semanticEquals(fanout)
      case _ => false
    }
    plan.exists { case Filter(c, _) => guarded(c); case _ => false }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint,
                      width: Long, maxFanout: Long): Option[LogicalPlan] = {
    // belt to the SkipTag's suspenders: never touch a join that already
    // carries graft bucket columns, even if a later rule dropped the tag
    if ((left.output ++ right.output).exists(_.name.startsWith("__graft_")))
      return None
    // peel the conjunction; any lower-bound + upper-bound pair over the
    // semantically same integral pv (with pv and the bounds on opposite
    // sides) makes the join bucketizable — remaining conjuncts ride
    // along in the residual condition
    val oriented = splitConjunctivePredicates(cond).flatMap(orientedBounds)
    val candidates = for {
      (pv1, lo, isLow) <- oriented if isLow
      (pv2, hi, isLow2) <- oriented if !isLow2
      if pv1.semanticEquals(pv2)
      if integral(pv1) && integral(lo) && integral(hi)
      sides <- sideOf(pv1, lo, hi, left, right)
    } yield (pv1, lo, hi, sides)
    val (pv, lo, hi, (pointPlan, intervalPlan)) =
      candidates.headOption.getOrElse(return None)
    if (hasFanoutGuard(intervalPlan, lo, hi, width)) return None

    val fanout = Subtract(fdiv(hi, width), fdiv(lo, width))

    // fast path: bucketize intervals within the fan-out bound.
    // inverted/null bounds cannot match and would break sequence()
    val pb = Alias(fdiv(pv, width), "__graft_pb")()
    val pointProj = Project(pointPlan.output :+ pb, pointPlan)
    val narrow = Filter(And(Not(GreaterThan(lo, hi)),
      LessThanOrEqual(fanout, Literal(maxFanout))), intervalPlan)
    // Sequence is TimeZoneAware: without an explicit zone the new node
    // is unresolved and fails the optimizer's plan validation
    val gen = Explode(Sequence(fdiv(lo, width), fdiv(hi, width),
      Some(Literal(1L)), Some(conf.sessionLocalTimeZone)))
    val ibAttr = gen.elementSchema.headOption match {
      case Some(f) => AttributeReference("__graft_ib", f.dataType, f.nullable)()
      case None => return None
    }
    val genPlan = Generate(gen, unrequiredChildIndex = Nil, outer = false,
      qualifier = None, generatorOutput = Seq(ibAttr), child = narrow)
    val bucketJoin = Join(pointProj, genPlan, Inner,
      Some(And(EqualTo(pb.toAttribute, ibAttr), cond)), hint)
    bucketJoin.setTagValue(SkipTag, ())
    val fast = Project(j.output, bucketJoin)

    // guard path: intervals too wide to bucketize keep the original
    // nested-loop plan (empty at runtime in the non-pathological case,
    // where AQE's empty-relation propagation collapses the branch)
    val wide = Filter(GreaterThan(fanout, Literal(maxFanout)), intervalPlan)
    val (slowLeft, slowRight) =
      if (pointPlan eq left) (left, wide) else (wide, right)
    val slowJoin = Join(slowLeft, slowRight, Inner, Some(cond), hint)
    slowJoin.setTagValue(SkipTag, ())
    val slow = Project(j.output, slowJoin)

    Some(Union(Seq(fast, slow)))
  }
}
