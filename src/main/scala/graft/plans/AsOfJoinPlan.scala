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
      var curKey: Any = null
      var curPay: Any = null
      var havePay = false

      lIter.map { lRow =>
        val k = lKeyProj(lRow).get(0, keyType)
        val t = lTimeProj(lRow).get(0, timeType)
        if (curKey == null || keyOrd.compare(curKey, k) != 0) {
          // entering a new left key: reset state, skip right rows of
          // smaller keys
          curKey = k; curPay = null; havePay = false
          while (rBuf.hasNext &&
            keyOrd.compare(rKeyProj(rBuf.head).get(0, keyType), k) < 0) rBuf.next()
        }
        // consume right rows of this key with time <= t
        var advancing = true
        while (advancing && rBuf.hasNext) {
          val rHead = rBuf.head
          val rKeyV = rKeyProj(rHead).get(0, keyType)
          if (keyOrd.compare(rKeyV, k) == 0 &&
              timeOrd.compare(rTimeProj(rHead).get(0, timeType), t) <= 0) {
            curPay = rPayProj(rHead).get(0, pay.dataType)
            havePay = true
            rBuf.next()
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
