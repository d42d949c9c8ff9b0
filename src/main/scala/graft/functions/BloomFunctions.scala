package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

/** Bloom-filter build + probe surfaced as Columns (SURVEY §2.11
  * extension path (b): native Catalyst expressions, zero UDFs).
  *
  * Spark ships codegen'd `BloomFilterAggregate` / `BloomFilterMightContain`
  * for its own runtime join filtering but does not register them as SQL
  * functions; this bridge (and [[GraftExtensions]]) makes the same
  * kernels available to the engine's pipelines.
  *
  * Scale shape — the semi-join pre-filter pattern
  * (`Tables.spread`-style facts ⋈ selective dims at 100 TB):
  *  1. build: one distributed aggregate over the SMALL side's join
  *     keys → a single binary blob sized by `expectedItems`/`numBits`
  *     (1M keys ≈ 1.2 MB at the default FPP);
  *  2. probe: the blob rides the plan as a literal (same physics as
  *     Spark's own InjectRuntimeFilter, where the subquery result is
  *     broadcast), and `might_contain` filters the 100 TB side INSIDE
  *     whole-stage codegen, before the shuffle;
  *  3. exactness: the filter only PRUNES — false positives survive to
  *     the real join, so results are bit-identical to the unfiltered
  *     plan while the shuffle moves ~|match| rows instead of |fact|.
  */
object BloomFunctions {

  /** Distributed bloom build over `xxhash64(key)` values. */
  def bloom_filter_agg(hashedKey: Column, expectedItems: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(hashedKey), expectedItems)
        .toAggregateExpression())

  /** Codegen'd membership probe; `bloom` must be foldable (a literal
    * blob) or a scalar subquery — enforced by the expression itself. */
  def might_contain(bloom: Column, hashedKey: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(hashedKey)))

  /** Build a bloom filter of `keys.col(keyCol)` and return it as a
    * literal Column. The aggregate runs distributed; only the finished
    * blob (KBs–MBs) crosses to the driver — the same edge-collect
    * contract as fitted models/centroids (SURVEY S5). */
  def buildKeyFilter(keys: DataFrame, keyCol: String, expectedItems: Long): Column = {
    val bytes = keys
      .agg(bloom_filter_agg(xxhash64(col(keyCol)), expectedItems).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    lit(bytes)
  }
}
