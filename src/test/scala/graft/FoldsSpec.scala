package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Folds

/** M1/T3/T5 properties (SURVEY §5.2): folds are a disjoint exhaustive
  * cover of eras with np.array_split sizing; permutation preserves the
  * per-era multiset. */
class FoldsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("eraKFoldRandom: disjoint exhaustive cover, array_split sizes") {
    val eras = (1L to 11L).toDF("era")
    val folds = Folds.eraKFoldRandom(eras, "era", 3, seed = 42).collect()
    assert(folds.map(_.getLong(0)).toSet == (1L to 11L).toSet)
    assert(folds.length == 11) // each era exactly once
    val sizes = folds.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    // np.array_split(11, 3) -> 4, 4, 3
    assert(sizes == Map(0L -> 4, 1L -> 4, 2L -> 3))
  }

  test("eraKFoldRandom is deterministic per seed, varies across seeds") {
    val eras = (1L to 9L).toDF("era")
    def run(seed: Long) = Folds.eraKFoldRandom(eras, "era", 3, seed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(1) == run(1))
    assert(run(1) != run(2))
  }

  test("eraKFoldHashed: array_split sizes over the hash order, no collect") {
    val eras = (1L to 11L).toDF("era")
    val folds = Folds.eraKFoldHashed(eras, "era", 3, "s1").collect()
    assert(folds.map(_.getLong(0)).toSet == (1L to 11L).toSet)
    assert(folds.length == 11)
    val sizes = folds.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    // np.array_split(11, 3) -> 4, 4, 3
    assert(sizes == Map(0L -> 4, 1L -> 4, 2L -> 3))
  }

  test("eraKFoldHashed: n < k leaves later folds empty, no div-by-zero") {
    val eras = Seq(10L, 20L).toDF("era")
    val folds = Folds.eraKFoldHashed(eras, "era", 3, "s1").collect()
    val sizes = folds.groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    assert(sizes == Map(0L -> 1, 1L -> 1))
  }

  test("eraKFoldHashed is deterministic per salt, varies across salts") {
    val eras = (1L to 9L).toDF("era")
    def run(salt: String) = Folds.eraKFoldHashed(eras, "era", 3, salt)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run("a") == run("a"))
    assert(run("a") != run("b"))
  }

  test("permuteWithinEraTwoPass is row-identical to the one-pass form") {
    // heavy order-key ties (hash mod 4) so tie-break correctness is
    // exercised, plus the real-fixture shape at TestSpark.sf
    val df = (1L to 400L).map(i => (i % 3, i, i.toDouble)).toDF("era", "id", "v")
    val key = pmod(xxhash64(col("id"), lit(7)), lit(4))
    val one = Folds.permuteWithinEra(df, "v", "era", Seq("id"), key)
    val two = Folds.permuteWithinEraTwoPass(df, "v", "era", Seq("id"), key, buckets = 8)
    assert(one.except(two).count() == 0 && two.except(one).count() == 0)
    assert(two.count() == df.count())
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select(Tables.eraOfDate(col("l_shipdate")).as("era"),
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val hk = (col("l_orderkey") * lit(2654435761L) + col("l_linenumber") * lit(40503L)
      + col("l_partkey") * lit(7919L) + col("l_suppkey") * lit(104729L)) % lit(999999937L)
    val ids = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val oneLi = Folds.permuteWithinEra(li, "l_quantity", "era", ids, hk)
    val twoLi = Folds.permuteWithinEraTwoPass(li, "l_quantity", "era", ids, hk)
    assert(oneLi.except(twoLi).count() == 0 && twoLi.except(oneLi).count() == 0)
  }

  test("permuteWithinEra: per-era multiset preserved, rows stay in era") {
    val df = (1L to 30L).map(i => (i % 3, i, i.toDouble)).toDF("era", "id", "v")
    val perm = Folds.permuteWithinEra(df, "v", "era", Seq("id"),
      xxhash64(col("id"), lit(7)))
    val before = df.groupBy("era").agg(sort_array(collect_list("v")).as("vs"))
    val after = perm.groupBy("era").agg(sort_array(collect_list("v")).as("vs"))
    assert(before.except(after).count() == 0 && after.except(before).count() == 0)
    // and it actually permutes (some value moved)
    val moved = perm.as("p").join(df.as("o"), Seq("era", "id"))
      .filter(col("p.v") =!= col("o.v")).count()
    assert(moved > 0)
  }

  test("foldAssignment: rank-mod-k is stable") {
    val eras = Seq(5L, 1L, 3L).toDF("era")
    val got = Folds.foldAssignment(eras, "era", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (3L, 1L), (5L, 0L)))
  }
}
