package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT grouped percentiles as a relational plan — a drop-in for
  * `expr("percentile(v, p)")` that computes bit-identical results
  * (ExactPercentileSpec pins equality on fixtures, ties, and nulls)
  * from a groupBy + one running-frame window instead of Spark's
  * `Percentile` aggregate.
  *
  * Why replace a builtin: `Percentile` buffers EVERY distinct value
  * of a group in one in-memory OpenHashMap aggregation buffer, and
  * merges those maps across partials — for mostly-unique doubles the
  * buffer is group-sized, the merge allocation-heavy (the r13 bench
  * measured `q_quantiles` at 1.1 s for a 150k-row fixture — the
  * single aggregate was the whole cost), and an over-large group OOMs
  * rather than spills. The relational form:
  *   1. groupBy (group, value) count — partial-aggregated shuffle,
  *      at most one row per distinct value;
  *   2. ONE running-frame window per group ordered by value gives the
  *      cumulative count (incremental, sort-based, spillable);
  *   3. every percentile's bracketing order statistics reduce to
  *      row-local predicates on (cum - c, cum) — value-at-index-i is
  *      the row with cum - c <= i < cum — collected by a conditional
  *      max in one final aggregate;
  *   4. the interpolation replays `PercentileBase.getPercentile`
  *      EXACTLY: pos = p * (n-1), (higher - pos) * vLo +
  *      (pos - lower) * vHi, with the same equal-index and
  *      equal-value short-circuits.
  * Cost: one extra (tiny, distinct-valued) shuffle in exchange for a
  * spillable sort and a plan whose memory is bounded per TASK, not
  * per group — strictly safer at 100 TB group sizes, measurably
  * faster at fixture scale. The per-group window is over DISTINCT
  * values; a group whose distinct-value count outgrows a task is the
  * regime where exactness itself is the wrong ask — swap to the
  * mergeable sketch (`q_sketch_quantile`).
  *
  * Null `v` rows are ignored for ranks (the builtin's semantics) but
  * counted in the emitted `n_total`.
  *
  * KNOWN DELIBERATE DIVERGENCE: SQL groupBy normalizes -0.0 to 0.0,
  * while the builtin's OpenHashMap buffers them as distinct
  * boxed-Double keys and can emit -0.0 as a bracketing value. On data
  * containing both zeros this form returns +0.0 where the builtin may
  * return -0.0 — the SQL-consistent behavior (every other graft
  * groupBy treats the zeros as one key), kept rather than replayed.
  */
object ExactPercentile {

  /** One row per group: the groupBy columns, one DOUBLE column per
    * (outName -> p), plus `n_total` (ALL group rows, null values
    * included — `count(*)` parity for callers that also need the
    * group size without a second scan). `groupBy` may be empty
    * (global percentiles — the single ordered task then holds the
    * distinct-value relation, same bound as the builtin's one
    * buffer). */
  def grouped(df: DataFrame, groupBy: Seq[String], valueCol: String,
              ps: Seq[(String, Double)]): DataFrame = {
    require(ps.nonEmpty)
    // constant group key when ungrouped: keeps one code path and
    // avoids the partitionless-window WARN
    val g =
      if (groupBy.nonEmpty) groupBy.map(col)
      else Seq(lit(true).as("graft_all"))
    val gNames = if (groupBy.nonEmpty) groupBy else Seq("graft_all")
    val v = col(valueCol).cast("double")
    val cnts = df
      .groupBy((g :+ v.as("graft_v")): _*)
      .agg(count(lit(1)).as("graft_c"))
    val gCols = gNames.map(col)
    val run = Window.partitionBy(gCols: _*).orderBy(col("graft_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(gCols: _*)
    // null values sort first but must not consume rank indices: their
    // effective count is 0, so cum-c <= i < cum can never hold there
    val cEff = when(col("graft_v").isNotNull, col("graft_c")).otherwise(0L)
    val cum = cnts
      .withColumn("graft_ce", cEff)
      .withColumn("graft_cum", sum(col("graft_ce")).over(run))
      .withColumn("graft_n", sum(col("graft_ce")).over(whole))
      .withColumn("graft_nt", sum(col("graft_c")).over(whole))
    // all bracketing predicates are ROW-LOCAL (n rides every row), so
    // one final aggregate collects every percentile's order statistics
    def pos(p: Double): Column = (col("graft_n") - 1).cast("double") * lit(p)
    def at(i: Column): Column =
      when(col("graft_cum") - col("graft_ce") <= i && col("graft_cum") > i,
        col("graft_v"))
    val aggs = ps.flatMap { case (name, p) =>
      val lo = floor(pos(p)).cast("long")
      val hi = ceil(pos(p)).cast("long")
      Seq(max(at(lo)).as(s"graft_lo_$name"), max(at(hi)).as(s"graft_hi_$name"))
    } ++ Seq(max(col("graft_n")).as("graft_n"), max(col("graft_nt")).as("n_total"))
    val folded = cum.groupBy(gCols: _*).agg(aggs.head, aggs.tail: _*)
    val outs = ps.map { case (name, p) =>
      val n1 = (col("graft_n") - 1).cast("double")
      val ppos = n1 * lit(p)
      val lo = floor(ppos).cast("long")
      val hi = ceil(ppos).cast("long")
      val vLo = col(s"graft_lo_$name")
      val vHi = col(s"graft_hi_$name")
      // PercentileBase.getPercentile's exact branches and FP op order
      when(col("graft_n") === 0, lit(null).cast("double"))
        .when(hi === lo || vHi === vLo, vLo)
        .otherwise((hi.cast("double") - ppos) * vLo +
          (ppos - lo.cast("double")) * vHi)
        .as(name)
    }
    val keep = if (groupBy.nonEmpty) groupBy.map(col) else Seq.empty[Column]
    val out = folded.select((keep ++ outs :+ col("n_total")): _*)
    if (groupBy.nonEmpty) out
    else {
      // ungrouped drop-in parity: a GLOBAL builtin aggregate returns
      // exactly one row even on an empty relation (null percentiles,
      // n_total = 0); a groupBy over the empty counts relation would
      // return zero. Seed the one row and left-join the result on.
      val spark = df.sparkSession
      import spark.implicits._
      Seq(true).toDF("graft_seed")
        .join(broadcast(out.withColumn("graft_seed", lit(true))),
          Seq("graft_seed"), "left")
        .select(ps.map { case (name, _) => col(name) }
          :+ coalesce(col("n_total"), lit(0L)).as("n_total"): _*)
    }
  }
}
