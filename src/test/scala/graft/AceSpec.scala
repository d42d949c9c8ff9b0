package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The relational fixed-3-iteration ACE (q_ace_corr) must agree with
  * the driver-side MaxCorr smoother run for exactly 3 iterations on
  * the same data — same bins, same alternation, modulo the affine
  * standardization that drops out of the correlation. */
class AceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("relational ACE equals driver ACE at 3 iterations") {
    val rows = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"))
      .collect()
    val x = rows.map(_.getDouble(0))
    val y = rows.map(_.getDouble(1))
    val driver = graft.ml.MaxCorr.maxCorrelation(x, y, nBins = 10,
      maxIter = 3, tol = 0.0)
    val rel = graft.queries.StatsPack.qAceCorr(spark, TestSpark.sf)
      .head().getDouble(0)
    assert(math.abs(rel - driver) < 1e-4, s"relational=$rel driver=$driver")
  }

  test("ACE recovers a nonlinear (quadratic) dependence Pearson misses") {
    import spark.implicits._
    val n = 2000
    val xs = (0 until n).map(i => -1.0 + 2.0 * i / (n - 1))
    val df = xs.map(v => (v, v * v)).toDF("x", "y")
    // Pearson is blind to the symmetric dependence; 3 ACE iterations
    // (the same count the relational query runs) are not
    val pear = df.agg(corr(col("x"), col("y"))).head().getDouble(0)
    val ace = graft.ml.MaxCorr.maxCorrelation(
      xs.toArray, xs.map(v => v * v).toArray, maxIter = 3, tol = 0.0)
    assert(math.abs(pear) < 0.05)
    assert(ace > 0.9)
  }
}
