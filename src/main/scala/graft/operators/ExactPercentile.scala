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

  /** Estimated input bytes above which [[grouped]] dispatches to the
    * sketch-bucketed cum-count (no window partition ever spans a whole
    * group) instead of the one-running-window-per-group form. The
    * statistic is Catalyst's plan-size estimate — free at plan time
    * (no dispatch count job; the EraRank dispatchers pay one), and a
    * safe upper bound on the largest group's distinct-value relation.
    * The r17 probe measured the bucketed form as a fixture-scale
    * pessimization (extra exchange + frozen-edges action), so the
    * default keeps every input that plausibly fits one sort task on
    * the one-pass plan and reserves the bucketed plan for inputs
    * where a single per-group task is the real hazard. Override per
    * session via `spark.graft.percentile.onePassMaxBytes`. */
  val DefaultOnePassMaxBytes: Long = 128L << 20

  /** One row per group: the groupBy columns, one DOUBLE column per
    * (outName -> p), plus `n_total` (ALL group rows, null values
    * included — `count(*)` parity for callers that also need the
    * group size without a second scan). `groupBy` may be empty
    * (global percentiles — the single ordered task then holds the
    * distinct-value relation, same bound as the builtin's one
    * buffer).
    *
    * SIZE-DISPATCHED (r18): below [[DefaultOnePassMaxBytes]] (by
    * Catalyst's estimate) the cumulative count comes from one
    * running-frame window per group; above it, from the same
    * sketch-bucketed offset decomposition as
    * [[EraRank.withPctRankFirstTwoPass]] — identical integers by
    * construction (ExactPercentileSpec pins both forms to the builtin
    * on ties, nulls, and all-null groups), so the dispatch is a pure
    * plan choice. `onePassMaxBytes`: -1 resolves the session conf /
    * default; an explicit 0 forces the bucketed form (how the spec
    * and plan audits pin the ceiling-remover machinery). */
  def grouped(df: DataFrame, groupBy: Seq[String], valueCol: String,
              ps: Seq[(String, Double)],
              onePassMaxBytes: Long = -1L): DataFrame = {
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
    val ceiling =
      if (onePassMaxBytes >= 0) onePassMaxBytes
      else df.sparkSession.conf
        .get("spark.graft.percentile.onePassMaxBytes",
          DefaultOnePassMaxBytes.toString).toLong
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // null values sort first but must not consume rank indices: their
    // effective count is 0, so cum-c <= i < cum can never hold there
    val cEff = when(col("graft_v").isNotNull, col("graft_c")).otherwise(0L)
    val cum =
      if (est <= BigInt(ceiling)) {
        val run = Window.partitionBy(gCols: _*).orderBy(col("graft_v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val whole = Window.partitionBy(gCols: _*)
        cnts
          .withColumn("graft_ce", cEff)
          .withColumn("graft_cum", sum(col("graft_ce")).over(run))
          .withColumn("graft_n", sum(col("graft_ce")).over(whole))
          .withColumn("graft_nt", sum(col("graft_c")).over(whole))
      } else bucketedCum(cnts.withColumn("graft_ce", cEff), gNames)
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
    groupedFinish(df, groupBy, ps, out)
  }

  /** The sketch-bucketed cumulative count — the 100 TB path of
    * [[grouped]], removing the one-task-per-group running window: the
    * same monotone-bucket decomposition as
    * [[EraRank.withPctRankFirstTwoPass]], here over the DISTINCT
    * (group, value) counts.
    *   1. a sketch aggregate fits 31 coarse CDF edges per group over
    *      the distinct values (only monotonicity is used; edges are
    *      frozen to plan literals so every consumer provably sees the
    *      same boundaries);
    *   2. each row buckets by `#edges < v` — a pure function of the
    *      value, so bucketing is monotone and ties co-bucket;
    *   3. per-(group, bucket) EXACT sums cumsum into exclusive
    *      offsets (plus per-group totals) over a tiny
    *      #groups × buckets relation, broadcast back;
    *   4. offset + within-(group, bucket) running sum = exactly the
    *      global running sum — all integers, bit-identical to the
    *      one-pass window.
    * Null values co-bucket at 0 (they sort first there, matching the
    * one-pass NULLS FIRST order) with effective count 0, so they can
    * never satisfy a bracketing predicate — the builtin's semantics,
    * preserved. */
  private def bucketedCum(cnts: DataFrame, gNames: Seq[String]): DataFrame = {
    val gCols = gNames.map(col)
    val buckets = 32
    val pcts = array((1 until buckets).map(i => lit(i.toDouble / buckets)): _*)
    val edges = graft.Frozen.copy(cnts.groupBy(gCols: _*)
      .agg(percentile_approx(col("graft_v"), pcts, lit(100)).as("graft_edges")))
    val bucketed = cnts.join(broadcast(edges), gNames, "left")
      .withColumn("graft_bkt",
        coalesce(size(filter(col("graft_edges"), e => e < col("graft_v"))), lit(0)))
      .drop("graft_edges")
    val offs = bucketed.groupBy((gCols :+ col("graft_bkt")): _*)
      .agg(sum(col("graft_ce")).as("graft_sb"), sum(col("graft_c")).as("graft_cb"))
      .withColumn("graft_offe", coalesce(
        sum(col("graft_sb")).over(Window.partitionBy(gCols: _*)
          .orderBy(col("graft_bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("graft_n",
        sum(col("graft_sb")).over(Window.partitionBy(gCols: _*)))
      .withColumn("graft_nt",
        sum(col("graft_cb")).over(Window.partitionBy(gCols: _*)))
      .select((gCols :+ col("graft_bkt") :+ col("graft_offe")
        :+ col("graft_n") :+ col("graft_nt")): _*)
    val local = Window.partitionBy((gCols :+ col("graft_bkt")): _*)
      .orderBy(col("graft_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offs), gNames :+ "graft_bkt")
      .withColumn("graft_cum", col("graft_offe") + sum(col("graft_ce")).over(local))
      .drop("graft_bkt", "graft_offe")
  }

  /** The empty-relation parity tail of [[grouped]], shared by both cum
    * forms. */
  private def groupedFinish(df: DataFrame, groupBy: Seq[String],
                            ps: Seq[(String, Double)], out: DataFrame): DataFrame = {
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
