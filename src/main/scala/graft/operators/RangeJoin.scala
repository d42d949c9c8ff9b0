package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range / interval joins (engine-new, prompt scale rules): Spark has
  * no native range-join operator, and expressing one as a theta join
  * degenerates to BroadcastNestedLoopJoin — O(n·m) comparisons and a
  * broadcast of a whole side, which is exactly the plan that dies at
  * 100 TB.
  *
  * The scale-right shape is the published bucketized form (the same
  * trick behind Databricks' range-join hint and interval joins in
  * stream processors): discretize the join axis into fixed-width bins,
  * explode the interval side to every bin it overlaps, hash
  * equi-join on the bin id, then apply the exact predicate as a
  * residual filter. Every comparison is then local to one shuffle
  * partition, both sides partition by bin, and no pair is ever
  * produced twice (a point lives in exactly one bin).
  *
  * Bin-width tuning is the usual time/space trade: wider bins
  * replicate intervals less but let more non-matching candidates into
  * the residual filter. A good default is the typical interval
  * length, which keeps replication ≤ 2× while pruning most
  * non-overlapping candidates.
  */
object RangeJoin {

  private val Bin = "graft_range_bin"

  /** Point-in-interval join: rows of `points` paired with every row of
    * `intervals` whose [lo, hi) half-open range contains the point.
    * `pCol`/`loCol`/`hiCol` must be integral (epoch micros, epoch
    * seconds, any long axis). Output carries all columns of both
    * inputs; empty or inverted intervals (hi <= lo) match nothing.
    */
  def pointInInterval(points: DataFrame, pCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn(Bin, floor(col(pCol) / binWidth))
    // hi is exclusive, so the last overlapped bin is floor((hi-1)/w);
    // the when() guard keeps sequence() from descending on empty
    // intervals (same gotcha as TextOps.shingles)
    val i = intervals.withColumn(Bin,
      explode(when(col(hiCol) > col(loCol),
        sequence(floor(col(loCol) / binWidth), floor((col(hiCol) - 1) / binWidth)))
        .otherwise(array().cast("array<bigint>"))))
    p.join(i, Bin)
      .filter(col(pCol) >= col(loCol) && col(pCol) < col(hiCol))
      .drop(Bin)
  }

  /** Band self-join: unordered pairs (a, b) from one relation with
    * `idCol(a) < idCol(b)` and `|xCol(a) - xCol(b)| <= delta`. The bin
    * width IS delta, so a match can only sit in the same or an
    * adjacent bin — the right side replicates exactly 3×, independent
    * of data size. Output: left columns as-is, right columns suffixed
    * `_b`.
    */
  def bandPairs(df: DataFrame, idCol: String, xCol: String,
                delta: Double): DataFrame = {
    require(delta > 0, s"delta must be positive, got $delta")
    val a = df.withColumn(Bin, floor(col(xCol) / delta).cast("long"))
    val b = df.toDF(df.columns.map(_ + "_b").toIndexedSeq: _*)
      .withColumn(Bin, explode(array(
        floor(col(xCol + "_b") / delta).cast("long") - 1,
        floor(col(xCol + "_b") / delta).cast("long"),
        floor(col(xCol + "_b") / delta).cast("long") + 1)))
    a.join(b, Bin)
      .filter(col(idCol) < col(idCol + "_b") &&
        abs(col(xCol) - col(xCol + "_b")) <= delta)
      .drop(Bin)
  }
}
