package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{MlPack, TextPack}

/** The 100 TB skew guards (hot-shingle idf floor, LSH hot-bucket cap,
  * hash-fraction rung sampling): default thresholds must be no-ops at
  * fixture scale (row-equality vs the unguarded pipeline), tight
  * thresholds must actually suppress the hot keys, and the plans must
  * be the scale-safe shapes (no sort/limit funnels).
  */
class ShingleGuardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("default idf floor is a no-op at fixture scale") {
    val guarded = TextPack.jaccardPairs(spark, TestSpark.sf)
    val unguarded = TextPack.jaccardPairs(spark, TestSpark.sf, maxDf = Long.MaxValue)
    assert(guarded.count() == unguarded.count())
    assert(guarded.except(unguarded).count() == 0)
    assert(unguarded.except(guarded).count() == 0)
  }

  test("a tight idf floor suppresses hot shingles (and their pairs)") {
    // maxDf = 1 keeps only shingles unique to one doc -> no doc pair
    // can share a kept shingle -> zero candidates
    val got = TextPack.jaccardPairs(spark, TestSpark.sf, maxDf = 1L)
    assert(got.count() == 0)
  }

  test("default LSH bucket caps are no-ops at fixture scale") {
    val mhG = TextPack.minhashCandidates(spark, TestSpark.sf)
    val mhU = TextPack.minhashCandidates(spark, TestSpark.sf, maxBucket = Long.MaxValue)
    assert(mhG.except(mhU).count() == 0 && mhU.except(mhG).count() == 0)
    val shG = TextPack.simhashPairs(spark, TestSpark.sf)
    val shU = TextPack.simhashPairs(spark, TestSpark.sf, maxBucket = Long.MaxValue)
    assert(shG.except(shU).count() == 0 && shU.except(shG).count() == 0)
  }

  test("a tight bucket cap drops every multi-member bucket") {
    // cap = 1: a candidate pair requires >= 2 docs in one bucket, so
    // candidate generation must come up empty
    assert(TextPack.minhashCandidates(spark, TestSpark.sf, maxBucket = 1L).count() == 0)
    assert(TextPack.simhashPairs(spark, TestSpark.sf, maxBucket = 1L).count() == 0)
  }

  test("hash-fraction rung sample: no Sort, no GlobalLimit, deterministic") {
    val ev = Tables.events(spark, TestSpark.sf)
    val half = MlPack.hashFraction(ev, "event_id", 0.5)
    val p = half.queryExecution.executedPlan.toString
    assert(!p.contains("Sort"), p.take(800))
    assert(!p.contains("GlobalLimit"), p.take(800))
    val n = ev.count().toDouble
    val k = half.count().toDouble
    assert(k == MlPack.hashFraction(ev, "event_id", 0.5).count().toDouble)
    // binomial-ish: within +-15% of the asked fraction on the fixture
    assert(math.abs(k / n - 0.5) < 0.15, s"got ${k / n}")
    // nested fractions: the frac=1.0 rung is the identity
    assert(MlPack.hashFraction(ev, "event_id", 1.0).count().toLong == n.toLong)
  }
}
