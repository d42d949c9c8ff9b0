package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the temporal join Spark
  * lacks natively (SURVEY §2.3 notes the engine adds it; DuckDB has
  * ASOF JOIN, kdb calls it aj).
  *
  * Composition strategy (preference order (a) of the extension rules):
  * tag reference rows 0 and probe rows 1, union, then
  * `last(ref, ignoreNulls)` over (key ORDER BY time, tag, id ROWS
  * UNBOUNDED PRECEDING) — one shuffle on the key, partition-local
  * sort, no range join blow-up. At 100 TB this is the shape you want:
  * the probe side never replicates and skew follows the key
  * distribution like any window.
  *
  * A custom physical operator for the same semantics lives in
  * `graft.plans.AsOfJoinExec` (extension path (c)); this composition
  * is the default because Catalyst/AQE handle it end to end.
  */
object AsOf {

  /** For each left row: the latest right `payload` whose `timeCol` is
    * <= the left row's time (per `key`). Adds `<payload>_asof`
    * (null when no prior right row exists). `idCol` breaks time ties
    * deterministically; right rows win ties at equal time.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               timeCol: String, idCol: String, payload: String): DataFrame = {
    val probe = left
      .withColumn("graft_tag", lit(1))
      .withColumn("graft_ref", lit(null).cast(right.schema(payload).dataType))
    val ref = right
      .select(col(key), col(timeCol), col(idCol), col(payload).as("graft_ref"))
      .withColumn("graft_tag", lit(0))
    // align columns: probe keeps its full row; ref contributes only
    // key/time/id/tag/ref with nulls elsewhere
    val probeCols = probe.columns
    val refAligned = ref.select(probeCols.map {
      case c if ref.columns.contains(c) => col(c)
      case c => lit(null).cast(probe.schema(c).dataType).as(c)
    }: _*)
    val unioned = probe.unionByName(refAligned)
    val w = Window.partitionBy(col(key))
      .orderBy(col(timeCol).asc, col("graft_tag").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"${payload}_asof", last(col("graft_ref"), ignoreNulls = true).over(w))
      .filter(col("graft_tag") === 1)
      .drop("graft_tag", "graft_ref")
  }
}
