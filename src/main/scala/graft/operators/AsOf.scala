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

  /** The full merge_asof surface (r15): `direction` backward (latest
    * at-or-before — [[asOfJoin]]'s semantics), forward (earliest
    * at-or-after), or nearest (closer of the two, ties to backward —
    * the pandas rule); optional `tolerance` nulls a match farther
    * than the bound. `timeCol` must be NUMERIC (epoch micros) —
    * nearest/tolerance need time arithmetic, and a caller with
    * timestamps projects `unix_micros(ts)` first.
    *
    * Same composition as [[asOfJoin]] — tag, union, per-key window —
    * so the probe side never replicates and both direction frames
    * ride ONE shuffle on the key (the two orderings differ only in
    * tag polarity, an in-partition re-sort, not an exchange). The
    * matched (time, payload) travel together in one struct so the
    * tolerance test and the emitted payload can never come from
    * different reference rows. Tie rules, deterministic both ways:
    * backward picks the max-id reference at the matched time, forward
    * the min-id (each direction's nearest-in-sort-order); a reference
    * AT the probe's own time matches in both directions (Δ = 0). */
  def asOfJoinDirectional(left: DataFrame, right: DataFrame, key: String,
                          timeCol: String, idCol: String, payload: String,
                          direction: String = "backward",
                          tolerance: Long = -1L): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val payT = right.schema(payload).dataType
    val probe = left
      .withColumn("graft_tag", lit(1))
      .withColumn("graft_ref", lit(null).cast(payT))
    val ref = right
      .select(col(key), col(timeCol), col(idCol), col(payload).as("graft_ref"))
      .withColumn("graft_tag", lit(0))
    val probeCols = probe.columns
    val refAligned = ref.select(probeCols.map {
      case c if ref.columns.contains(c) => col(c)
      case c => lit(null).cast(probe.schema(c).dataType).as(c)
    }: _*)
    val u = probe.unionByName(refAligned)
      .withColumn("graft_m", when(col("graft_tag") === 0,
        struct(col(timeCol).as("t"), col("graft_ref").as("p"))))
    val wB = Window.partitionBy(col(key))
      .orderBy(col(timeCol).asc, col("graft_tag").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // probe rows sort BEFORE equal-time references here (tag desc), so
    // the (current, following) frame still sees at-time references
    val wF = Window.partitionBy(col(key))
      .orderBy(col(timeCol).asc, col("graft_tag").desc, col(idCol).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val mB = last(col("graft_m"), ignoreNulls = true).over(wB)
    val mF = first(col("graft_m"), ignoreNulls = true).over(wF)
    val withPick = direction match {
      case "backward" => u.withColumn("graft_pick", mB)
      case "forward"  => u.withColumn("graft_pick", mF)
      case "nearest" => u
        .withColumn("graft_b", mB).withColumn("graft_f", mF)
        .withColumn("graft_pick",
          when(col("graft_b").isNull, col("graft_f"))
            .when(col("graft_f").isNull, col("graft_b"))
            .when(col(timeCol) - col("graft_b.t")
              <= col("graft_f.t") - col(timeCol), col("graft_b"))
            .otherwise(col("graft_f")))
    }
    val inTol =
      if (tolerance < 0) lit(true)
      else abs(col(timeCol) - col("graft_pick.t")) <= lit(tolerance)
    withPick
      .filter(col("graft_tag") === 1)
      .withColumn(s"${payload}_asof",
        when(col("graft_pick").isNotNull && inTol, col("graft_pick.p")))
      .drop("graft_tag", "graft_ref", "graft_m", "graft_pick",
        "graft_b", "graft_f")
  }
}
