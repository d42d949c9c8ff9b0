package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Information-theoretic feature-distance aggregates
  * (`distance_func.py:9-22` variation of information via 2-D
  * histograms). Composed entirely from relational builtins — the 5x5
  * contingency table is a groupBy().count() and the entropies are
  * sum(-p*ln p) over it — so Catalyst gets full partial/final agg and
  * whole-stage codegen; no UDAF needed (SURVEY §4).
  */
object InfoTheory {

  /** A9: fixed-bound equi-width bucket id in [0, bins-1]
    * (`np.histogram`-style, clamped at both ends). */
  def bucket(x: Column, lo: Double, hi: Double, bins: Int): Column =
    greatest(lit(0), least(lit(bins - 1), floor((x - lo) / (hi - lo) * bins)))
      .cast("long")

  /** A9: 2-D histogram (`np.histogram2d(x, y, 5)` at
    * `distance_func.py:14`) as a (bx, by, n) relation. */
  def histogram2d(df: DataFrame, x: Column, y: Column,
                  xLo: Double, xHi: Double, yLo: Double, yHi: Double,
                  bins: Int): DataFrame =
    df.select(bucket(x, xLo, xHi, bins).as("bi"), bucket(y, yLo, yHi, bins).as("bj"))
      .groupBy(col("bi"), col("bj")).agg(count(lit(1)).as("n"))

  /** A10: variation of information VI = 2*H(X,Y) - H(X) - H(Y)
    * (`distance_func.py:9-22`), computed from a joint-count relation
    * (the output of [[histogram2d]]). One row out.
    *
    * Single-pass form: VI = Σ_xy p_xy·(ln p_x + ln p_y − 2·ln p_xy),
    * with the margins as window sums over the (tiny) joint relation —
    * the base table is scanned exactly once, vs. four scans for the
    * naive three-entropy composition.
    *
    * With `norm = true` the metric is divided by the joint entropy
    * H(X,Y) (`distance_func.py:18-21`), mapping it into [0, 1]; the
    * extra entropy term rides the same single aggregation, so the plan
    * shape is unchanged. A degenerate single-cell joint has
    * H(X,Y) = 0 and VI = 0; the division is guarded to emit 0.0 there
    * (0/0 NaN/NULL rendering is not portable across engines — the
    * qLshRecall convention), matched by a CASE WHEN in the oracles.
    */
  def variationOfInformation(joint: DataFrame, norm: Boolean = false): DataFrame = {
    val staged = joint
      .withColumn("tot", sum(col("n")).over(Window.partitionBy()).cast("double"))
      .withColumn("mx", sum(col("n")).over(Window.partitionBy(col("bi"))).cast("double"))
      .withColumn("my", sum(col("n")).over(Window.partitionBy(col("bj"))).cast("double"))
    val vi = sum((col("n") / col("tot")) *
      (log(col("mx") / col("tot")) + log(col("my") / col("tot"))
        - lit(2) * log(col("n") / col("tot"))))
    if (norm) {
      val hxy = -sum((col("n") / col("tot")) * log(col("n") / col("tot")))
      staged.agg(round(when(hxy > 0, vi / hxy).otherwise(lit(0.0)), 6).as("vi_norm"))
    } else staged.agg(round(vi, 6).as("vi"))
  }
}
