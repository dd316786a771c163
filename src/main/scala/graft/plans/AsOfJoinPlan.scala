package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.LongType

/** A NATIVE as-of join — SURVEY custom-operator ladder step (c): a
  * custom `LogicalPlan` node, a planner `SparkStrategy`, and a physical
  * `SparkPlan` whose `doExecute` runs a single forward merge per
  * co-partition — registered through `SparkSessionExtensions`
  * ([[GraftExtensions]]). The composed union+window form
  * ([[graft.operators.TemporalJoin.asOfJoin]]) remains the reference
  * implementation; this operator certifies the full Catalyst extension
  * surface AND removes the union's cost structure: the window form
  * shuffles LEFT+RIGHT together into one sorted window partition and
  * materializes a carried struct per row; the native form shuffles each
  * side independently (Exchange per child, like a sort-merge join),
  * sorts by (key, time), and streams both iterators through a merge
  * that holds O(1) state per key — no carried column, no union row
  * widening, no window buffer. At 100 TB that is the difference
  * between windowing 2·|fact| rows and merging |fact| + |dim| rows.
  *
  * Semantics (identical to the composed form, property-proved in
  * PropertySpec): LEFT OUTER; backward = latest right with
  * `rt ≤ lt` per key (inclusive), forward = earliest right with
  * `rt ≥ lt`; optional tolerance bounds the |lt−rt| gap in time units;
  * null left times and null right times never match; null KEYS group
  * together (both forms treat the null key as a value, like window
  * partitioning). Time columns are canonical epoch longs (the engine's
  * events contract); keys are any orderable types.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightPayload: Seq[Expression],
    matchedOutput: Seq[Attribute],
    backward: Boolean, toleranceNs: Option[Long])
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ matchedOutput

  // the node produces the matched columns itself; everything of LEFT
  // flows through (so column pruning must not strip the left child),
  // while only the referenced right columns are needed — a generic
  // pruner may drop the rest of the right side
  override def producedAttributes: AttributeSet = AttributeSet(matchedOutput)
  override def references: AttributeSet =
    (AttributeSet(expressions.flatMap(_.references)) ++ left.outputSet) --
      producedAttributes

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] onto [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, payload, out, backward, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt,
        payload, out, backward, tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightPayload: Seq[Expression],
    matchedOutput: Seq[Attribute],
    backward: Boolean, toleranceNs: Option[Long])
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ matchedOutput
  override def producedAttributes: AttributeSet = AttributeSet(matchedOutput)

  // co-partition both sides on the key (EnsureRequirements inserts the
  // exchanges and equalizes partition counts, exactly as for SMJ)...
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  // ...and sort each side by (key, time) so one merge pass suffices
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // left rows pass through in order: downstream consumers may reuse
  // the left-side partitioning and sort without a new exchange
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val leftOut = left.output
    val rightOut = right.output
    val matchedWidth = matchedOutput.length
    val isBackward = backward
    val tol = toleranceNs
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val payloadB = rightTime +: rightPayload
    val keyTypes = leftKeys.map(_.dataType)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rightOut)
      val lTime = BindReferences.bindReference(lTimeB, leftOut)
      val rTime = BindReferences.bindReference(rTimeB, rightOut)
      val payloadProj = UnsafeProjection.create(payloadB, rightOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val keyOrd: Ordering[InternalRow] =
        RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(matchedWidth)

      // current (unconsumed) right row, copied out of the iterator's
      // reused buffer; skips null-time rights entirely
      var rKey: UnsafeRow = null
      var rT: Long = 0L
      var rPayload: InternalRow = null
      var rDone = false
      def advanceRight(): Unit = {
        var found = false
        while (!found && rIt.hasNext) {
          val r = rIt.next()
          val t = rTime.eval(r)
          if (t != null) {
            rKey = rKeyProj(r).copy()
            rT = t.asInstanceOf[Long]
            rPayload = payloadProj(r).copy()
            found = true
          }
        }
        if (!found) { rDone = true; rKey = null; rPayload = null }
      }
      advanceRight()

      // backward: last right seen for the current key at rt ≤ lt
      var candKey: UnsafeRow = null
      var candT: Long = 0L
      var candPayload: InternalRow = null

      lIt.map { l =>
        val ltRaw = lTime.eval(l)
        var payload: InternalRow = nullPayload
        if (ltRaw != null) {
          val lt = ltRaw.asInstanceOf[Long]
          val lk = lKeyProj(l)
          if (isBackward) {
            var cont = !rDone
            while (cont) {
              val c = keyOrd.compare(rKey, lk)
              if (c < 0 || (c == 0 && rT <= lt)) {
                if (c == 0) { candKey = rKey; candT = rT; candPayload = rPayload }
                advanceRight()
                cont = !rDone
              } else cont = false
            }
            if (candKey != null && keyOrd.compare(candKey, lk) == 0 &&
                tol.forall(lt - candT <= _)) {
              payload = candPayload
              numMatched += 1
            }
          } else {
            var cont = !rDone
            while (cont) {
              val c = keyOrd.compare(rKey, lk)
              if (c < 0 || (c == 0 && rT < lt)) { advanceRight(); cont = !rDone }
              else cont = false
            }
            if (!rDone && keyOrd.compare(rKey, lk) == 0 &&
                tol.forall(rT - lt <= _)) {
              payload = rPayload
              numMatched += 1
            }
          }
        }
        numOutputRows += 1
        resultProj(joined(l, payload))
      }
    }
  }
}
