package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** The bucketized range join must be row-equal to the naive theta
  * join on adversarial inputs (multi-bin intervals, empty intervals,
  * boundary points) AND must plan as a hash/sort-merge equi-join on
  * the bin key — the whole point is never producing a nested-loop.
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pointInInterval equals the naive theta join") {
    val points = Seq(0L, 1L, 9L, 10L, 11L, 25L, 99L, 100L, 101L)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
    // spans: multi-bin (0-100), single-bin, empty (hi == lo), inverted
    // (hi < lo), and exact-boundary edges
    val intervals = Seq(
      (1L, 0L, 100L), (2L, 10L, 11L), (3L, 25L, 25L), (4L, 50L, 20L),
      (5L, 99L, 102L), (6L, -5L, 1L))
      .toDF("iid", "lo", "hi")
    // sorted Seq, not Set: a regression that emits a matching pair
    // twice must fail, not be hidden by set dedup
    for (w <- Seq(1L, 3L, 7L, 100L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
      val want = points.join(intervals,
          col("p") >= col("lo") && col("p") < col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
      assert(got == want, s"binWidth=$w")
    }
  }

  test("bandPairs equals the naive pair scan, including negative values") {
    val df = Seq((1L, 0.0), (2L, 0.04), (3L, 0.051), (4L, -0.02),
      (5L, 10.0), (6L, 10.05), (7L, -0.07), (8L, 0.0))
      .toDF("id", "x")
    val got = RangeJoin.bandPairs(df, "id", "x", 0.05)
      .select("id", "id_b").as[(Long, Long)].collect().toSeq.sorted
    val b = df.toDF("id_b", "x_b")
    val want = df.join(b,
        col("id") < col("id_b") && abs(col("x") - col("x_b")) <= 0.05)
      .select("id", "id_b").as[(Long, Long)].collect().toSeq.sorted
    // Seq equality (not Set): pins both membership AND exactly-once
    // emission — the identical x=0.0 pair (1,8) appears once
    assert(got == want)
    assert(got.count(_ == (1L, 8L)) == 1)
  }

  test("property: random intervals/points equal the naive theta join") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      pts <- Gen.listOfN(40, Gen.choose(-500L, 500L))
      ivs <- Gen.listOfN(15, Gen.zip(Gen.choose(-500L, 500L), Gen.choose(0L, 300L)))
      w <- Gen.oneOf(1L, 13L, 50L, 400L)
    } yield (pts, ivs, w)
    for (i <- 0 until 6) {
      val (pts, ivs, w) = gen.apply(Gen.Parameters.default, Seed(77L + i)).get
      val points = pts.zipWithIndex.map { case (p, k) => (k.toLong, p) }
        .toDF("pid", "p")
      // hi = lo + len; len 0 makes empty intervals part of the space
      val intervals = ivs.zipWithIndex.map { case ((lo, len), k) =>
        (k.toLong, lo, lo + len) }.toDF("iid", "lo", "hi")
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
      val want = points.join(intervals,
          col("p") >= col("lo") && col("p") < col("hi"))
        .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
      assert(got == want, s"seed=${77 + i} binWidth=$w")
    }
  }

  test("range join plans as an equi-join on the bin, never a nested loop") {
    for (name <- Seq("q_range_join", "q_band_join")) {
      val p = SparkEntry.queries(name)(spark, TestSpark.sf)
        .queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") &&
        !p.contains("CartesianProduct"),
        s"$name degenerated to a nested loop:\n${p.take(1200)}")
    }
  }
}
