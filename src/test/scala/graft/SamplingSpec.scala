package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

/** T4: the hash-Bernoulli seeded sample's contract — deterministic,
  * nested in the fraction, parameter-sensitive, and close to the
  * nominal rate. */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def keys(fraction: Double, seed: Long): Set[Long] =
    Sampling.seededBernoulli(Tables.orders(spark, TestSpark.sf),
        col("o_orderkey"), fraction, seed)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet

  test("same (seed, fraction) is deterministic; fraction=1 is identity") {
    assert(keys(0.1, 42) == keys(0.1, 42))
    val all = Tables.orders(spark, TestSpark.sf).count()
    assert(Sampling.seededBernoulli(Tables.orders(spark, TestSpark.sf),
      col("o_orderkey"), 1.0, 42).count() == all)
  }

  test("samples nest as the fraction grows (threshold monotonicity)") {
    val s01 = keys(0.1, 7)
    val s02 = keys(0.2, 7)
    assert(s01.subsetOf(s02))
    assert(s01.size < s02.size)
  }

  test("seed changes membership; rate is near nominal") {
    val a = keys(0.2, 7)
    val b = keys(0.2, 8)
    assert(a != b)
    val n = Tables.orders(spark, TestSpark.sf).count().toDouble
    for (s <- Seq(a, b)) {
      val rate = s.size / n
      assert(rate > 0.1 && rate < 0.3, s"rate $rate")
    }
  }
}
