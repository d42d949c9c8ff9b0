package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data
  * skipping — the write-side layout op that makes a 100 TB scan cheap
  * on MORE THAN ONE filter column at once.
  *
  * A sort on `(a, b)` gives parquet row groups tight min/max ranges on
  * `a` but leaves `b`'s stats spanning the whole domain, so predicate
  * pushdown skips nothing for `b`-only filters. Interleaving the bits
  * of binned `a` and `b` into one Morton key and sorting by THAT keys
  * each row group to a small rectangle of the (a, b) plane: min/max
  * stats are tight on BOTH columns and the reader's row-group pruning
  * (plus any engine's file-level skipping index) works for either
  * predicate. This is pure layout — content and query results are
  * unchanged, which is exactly what the oracle for `q_zorder_scan`
  * checks (same aggregates off the z-ordered copy as DuckDB computes
  * off the original table).
  *
  * Scale shape: one bounded 2-scalar-per-column agg for the bin
  * ranges, one range-shuffle on the Morton key, a partition-local
  * sort, and a straight parquet write — no driver data, no
  * all-pairs anything. `ZOrderSpec` proves the skipping claim by
  * reading the written row-group footers: both dimensions prune to a
  * fraction of row groups where a single-column sort leaves the other
  * dimension unprunable.
  */
object ZOrder {

  /** Morton-interleave two binned non-negative ints (`bits` each,
    * ≤ 21 so the result fits a long): bit i of `a` lands at 2i, bit i
    * of `b` at 2i+1. Pure `Column` composition — codegen'd, no UDF. */
  def interleaveBits(a: Column, b: Column, bits: Int): Column =
    interleaveBitsN(Seq(a, b), bits)

  /** The k-column generalization: bit i of column j lands at i·k + j,
    * so every dimension shares the curve's locality equally. Result
    * must fit a long: k·bits ≤ 62. */
  def interleaveBitsN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, s"need at least 2 columns, got $k")
    require(bits >= 1 && k * bits <= 62,
      s"k*bits must be in [k,62], got $k*$bits")
    cols.zipWithIndex.foldLeft(lit(0L)) { case (acc0, (c, j)) =>
      (0 until bits).foldLeft(acc0) { (acc, i) =>
        acc.bitwiseOR(shiftleft(c.bitwiseAND(lit(1L << i)), i * (k - 1) + j))
      }
    }
  }

  /** Scale `c ∈ [lo, hi]` onto the `[0, 2^bits)` integer grid (exact
    * long arithmetic: value offset times grid size over domain size). */
  def bin(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    val domain = hi - lo + 1
    ((c.cast("long") - lit(lo)) * lit(1L << bits) / lit(domain)).cast("long")
  }

  /** The Morton key of k long columns of `df`, binned by their
    * observed min/max (one bounded aggregate — 2k driver scalars,
    * the documented collect-at-edges exception). */
  def mortonKey(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    val r = df.agg(
      min(col(cols.head)).cast("long"), max(col(cols.head)).cast("long") +:
        cols.tail.flatMap(c =>
          Seq(min(col(c)).cast("long"), max(col(c)).cast("long"))): _*).head()
    // min/max are null on an empty frame or an all-null column; fail
    // with the column name, not an opaque NPE from inside the write
    cols.zipWithIndex.foreach { case (c, j) =>
      require(!r.isNullAt(2 * j) && !r.isNullAt(2 * j + 1),
        s"z-order column '$c' has no non-null values; cannot derive a bin range")
    }
    interleaveBitsN(
      cols.zipWithIndex.map { case (c, j) =>
        bin(col(c), r.getLong(2 * j), r.getLong(2 * j + 1), bits)
      }, bits)
  }

  def mortonKey(df: DataFrame, ca: String, cb: String, bits: Int): Column =
    mortonKey(df, Seq(ca, cb), bits)

  /** Write `df` z-ordered by `(ca, cb)`: range-partition then sort
    * partition-locally by the Morton key (the key is a sort EXPRESSION,
    * not a materialized column — the written schema is unchanged).
    * `blockSize` caps the parquet row-group size; smaller groups mean
    * finer-grained skipping at the cost of footer overhead. */
  def writeZOrdered(df: DataFrame, ca: String, cb: String, path: String,
                    bits: Int = 12, partitions: Int = 0,
                    blockSize: Int = 0): Unit = {
    val zk = mortonKey(df, ca, cb, bits)
    val n = if (partitions > 0) partitions
            else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val laid = df.repartitionByRange(n, zk).sortWithinPartitions(zk)
    val w = laid.write.mode("overwrite")
    (if (blockSize > 0) w.option("parquet.block.size", blockSize.toString)
     else w).parquet(path)
  }
}
