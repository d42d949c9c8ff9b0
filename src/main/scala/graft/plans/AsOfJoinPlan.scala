package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The full custom-operator extension path (SURVEY §2.11 preference
  * (c), guide "Custom operator"): as-of join as a first-class plan
  * node — logical node, planner strategy, and a physical
  * `BinaryExecNode` that declares hash distribution on the key and
  * (key, time, id) ordering, then runs a streaming two-pointer merge
  * per partition. No materialized pair set, no window state: O(1)
  * memory per key beyond the sort, the exact shape a 100 TB as-of
  * needs.
  *
  * Registered via the PUBLIC `spark.experimental.extraStrategies`
  * hook (no session rebuild required); semantics are pinned equal to
  * `operators.AsOf` (window composition) and `plans.AsOfMerge`
  * (cogroup) by `AsOfSpec`.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        leftId: Expression, rightId: Expression,
                        payload: Expression, outAttr: AttributeReference)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ outAttr
  // pay_asof is minted by this node, not consumed from children
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, li, ri, pay, out) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, li, ri, pay, out) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        leftId: Expression, rightId: Expression,
                        payload: Expression, outAttr: AttributeReference)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(outAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending),
      SortOrder(leftId, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightId, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
    val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
    val leftOut = left.output
    val rightOut = right.output
    val lk = leftKey; val lt = leftTime
    val rk = rightKey; val rt = rightTime; val pay = payload
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(Seq(lk), leftOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rk), rightOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rightOut)
      val rPayProj = UnsafeProjection.create(Seq(pay), rightOut)
      val outProj = UnsafeProjection.create(outAttrs, leftOut :+ outAttr)
      val joined = new JoinedRow
      val extra = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

      val rBuf = rIter.buffered
      var started = false
      var curKey: Any = null
      var curPay: Any = null
      var havePay = false
      // UnsafeProjection reuses its output row buffer across calls, so
      // for buffer-backed types (UTF8String / Decimal / binary) any
      // value cached across iterations MUST be copied out — otherwise
      // the next projection call silently rewrites what curKey/curPay
      // point at and key-change detection compares the buffer to
      // itself. InternalRow.copyValue is a no-op for primitives.
      def sameKey(a: Any, b: Any): Boolean =
        if (a == null || b == null) a == null && b == null
        else keyOrd.compare(a, b) == 0

      lIter.map { lRow =>
        val k = InternalRow.copyValue(lKeyProj(lRow).get(0, keyType))
        val t = lTimeProj(lRow).get(0, timeType)
        if (!started || !sameKey(curKey, k)) {
          // entering a new left key: reset state, skip right rows of
          // smaller keys (null right keys sort first and match nothing)
          started = true; curKey = k; curPay = null; havePay = false
          if (k != null) {
            var skipping = true
            while (skipping && rBuf.hasNext) {
              val rKeyV = rKeyProj(rBuf.head).get(0, keyType)
              if (rKeyV == null || keyOrd.compare(rKeyV, k) < 0) rBuf.next()
              else skipping = false
            }
          }
        }
        // consume right rows of this key with time <= t; a null left
        // key or null left time matches no right row (SQL semantics),
        // and a null-time right row matches nothing ever so it is
        // consumed rather than left to block the scan
        var advancing = k != null
        while (advancing && rBuf.hasNext) {
          val rHead = rBuf.head
          val rKeyV = rKeyProj(rHead).get(0, keyType)
          if (rKeyV != null && keyOrd.compare(rKeyV, k) == 0) {
            val rTimeV = rTimeProj(rHead).get(0, timeType)
            if (rTimeV == null) rBuf.next()
            else if (t != null && timeOrd.compare(rTimeV, t) <= 0) {
              curPay = InternalRow.copyValue(rPayProj(rHead).get(0, pay.dataType))
              havePay = true
              rBuf.next()
            } else advancing = false
          } else advancing = false
        }
        extra.update(0, if (havePay) curPay else null)
        outProj(joined(lRow, extra))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
