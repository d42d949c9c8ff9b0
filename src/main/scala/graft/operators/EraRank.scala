package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Era-partitioned rank/score operators — the scoring heart of the
  * reference (`metrics.py:5-33`).
  *
  * W1 (`metrics.py:19`): pandas `groupby('era').rank(pct=True,
  * method="first")`. `method="first"` breaks ties by order of
  * appearance, so the Spark equivalent is `row_number` over a
  * deterministic tie-broken ordering divided by the era row count —
  * NOT SQL `percent_rank()` (which is `(rank-1)/(n-1)` with shared
  * ranks for ties).
  *
  * Scale: the window partitions by era — each era's rows hash to one
  * shuffle partition. At 100 TB with ~100 eras that skews; mitigation
  * is a higher-cardinality era key (day/hour buckets) or the two-pass
  * count-join form. The per-era row counts here (<= a few M rows/era)
  * sort in-memory per partition fine.
  */
object EraRank {

  /** Adds `out` = per-era percentile rank of `pred`, ties broken by
    * `tie` columns (the reference relies on pandas row order; an
    * explicit key makes it deterministic and oracle-stable).
    */
  def withPctRankFirst(df: DataFrame, out: String, era: Column,
                       pred: Column, tie: Column*): DataFrame = {
    val order = Window.partitionBy(era).orderBy((pred +: tie).map(_.asc): _*)
    val whole = Window.partitionBy(era)
    df.withColumn(out,
      row_number().over(order).cast("double") / count(lit(1)).over(whole))
  }

  /** M2 `spearman_rank` (`metrics.py:5-22`): per-era pct-rank the
    * predictions, then Pearson-correlate the ranks with the truth over
    * ALL rows — one global aggregate, one row out.
    */
  def spearmanByEra(df: DataFrame, era: Column, pred: Column, truth: Column,
                    tie: Column*): DataFrame = {
    withPctRankFirst(df, "graft_r", era, pred, tie: _*)
      .agg(round(corr(truth, col("graft_r")), 6).as("spearman"))
  }

  /** Per-era Spearman variant (the notebook's per-era diagnostics):
    * one correlation row per era.
    */
  def spearmanPerEra(df: DataFrame, era: Column, pred: Column, truth: Column,
                     tie: Column*): DataFrame = {
    withPctRankFirst(df.withColumn("graft_era", era), "graft_r",
        col("graft_era"), pred, tie: _*)
      .groupBy(col("graft_era").as("era"))
      .agg(round(corr(truth, col("graft_r")), 6).as("spearman"))
  }

  /** A5 quartic mean error (`metrics.py:25-33`):
    * mean((y_true - y_pred)^4), rank-normalized inputs upstream.
    */
  def quarticMeanError(df: DataFrame, truth: Column, pred: Column): DataFrame =
    df.agg(round(avg(pow(truth - pred, 4)), 6).as("qme"))

  /** P8 payout clip (`utils.py:55`): ((s-0)/0.2) clamped to [-1, 1]. */
  def payoutClip(score: Column): Column =
    least(lit(1.0), greatest(lit(-1.0), score / 0.2))
}
