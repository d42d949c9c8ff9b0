package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted join equals plain join on a skewed key") {
    // 90% of left rows share key 1 (the skew), right is a small dim
    val left = (1L to 1000L).map(i => (if (i <= 900) 1L else i % 7, i))
      .toDF("k", "v")
    val right = (0L to 6L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = left.join(right, "k")
    val salted = SkewJoin.saltedJoin(left, right, "k", salt = 8)
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }
}
