package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.AttributeReference

import org.apache.spark.sql.graftshim.ColumnBridge

/** User-facing entry for the custom as-of plan node: resolves the
  * column references against the analyzed children, registers the
  * planner strategy (public `spark.experimental.extraStrategies`
  * hook), and returns a DataFrame over the custom logical node.
  */
object AsOfApi {

  def asOfJoinPlanned(left: DataFrame, right: DataFrame, key: String,
                      timeCol: String, idCol: String, payload: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughAsOf)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushFilterThroughAsOf
    }
    val lp = ColumnBridge.analyzed(left)
    // rename right columns behind fresh aliases: keeps this node's
    // captured references valid even when left/right share lineage
    // (the analyzer's relation dedup rewrites subtree ids, but alias
    // ids introduced here survive)
    import org.apache.spark.sql.functions.col
    val rp = ColumnBridge.analyzed(
      right.select(right.columns.map(c => col(c).as(s"graft_r_$c")): _*))
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val pay = attr(rp, s"graft_r_$payload")
    val out = AttributeReference(s"${payload}_asof", pay.dataType, nullable = true)()
    val node = AsOfJoinNode(lp, rp,
      attr(lp, key), attr(rp, s"graft_r_$key"),
      attr(lp, timeCol), attr(rp, s"graft_r_$timeCol"),
      attr(lp, idCol), attr(rp, s"graft_r_$idCol"), pay, out)
    ColumnBridge.ofRows(spark, node)
  }
}
