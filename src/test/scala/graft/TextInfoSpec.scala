package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{InfoTheory, TextOps}

class TextInfoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingles: n-grams with count len-n+1; short docs give empty") {
    val df = Seq("a b c d", "x y", "solo").toDF("text")
    val got = df.select(TextOps.shingles(col("text"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("fingerprint is whitespace/case-canonical") {
    val df = Seq(("A  b\tC", 1), ("a b c", 2), ("a b d", 3)).toDF("text", "id")
    val fps = df.select(TextOps.fingerprint(col("text")).as("fp"))
      .as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("hash60 is non-negative and stable") {
    val h = Seq("x").toDF("t").select(TextOps.hash60(col("t"))).as[Long].head()
    assert(h >= 0)
    val h2 = Seq("x").toDF("t").select(TextOps.hash60(col("t"))).as[Long].head()
    assert(h == h2)
  }

  test("VI(x, x) = 0 and VI is symmetric") {
    val df = (1 to 200).map(i => (i.toDouble % 7, (i * 13 % 11).toDouble))
      .toDF("x", "y")
    val vixx = InfoTheory.variationOfInformation(
      InfoTheory.histogram2d(df, col("x"), col("x"), 0, 7, 0, 7, 5))
      .as[Double].head()
    assert(math.abs(vixx) < 1e-9)
    val vixy = InfoTheory.variationOfInformation(
      InfoTheory.histogram2d(df, col("x"), col("y"), 0, 7, 0, 11, 5))
      .as[Double].head()
    val viyx = InfoTheory.variationOfInformation(
      InfoTheory.histogram2d(df, col("y"), col("x"), 0, 11, 0, 7, 5))
      .as[Double].head()
    assert(math.abs(vixy - viyx) < 1e-9)
    assert(vixy >= 0)
  }

  test("histogram2d counts sum to row count and buckets are clamped") {
    val df = Seq(-5.0, 0.0, 2.5, 5.0, 99.0).map(x => (x, x)).toDF("x", "y")
    val h = InfoTheory.histogram2d(df, col("x"), col("y"), 0, 5, 0, 5, 5)
    assert(h.agg(sum("n")).as[Long].head() == 5)
    val buckets = h.select("bi").as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b <= 4))
  }
}
