package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{EraRank, Folds, InfoTheory}

/** Generator-driven properties (SURVEY §5.2.3): rank in (0,1]; corr in
  * [-1,1] or null; folds cover exactly; aggregates are permutation-
  * invariant; VI is non-negative and symmetric under column swap.
  * (Raw ScalaCheck generators with a fixed seed — the scalatestplus
  * bridge artifact is not in the offline cache.)
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val smallData: Gen[List[(Int, Double)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(1, 4), Gen.choose(-100.0, 100.0)))

  test("property: pct-rank lies in (0, 1] and each era's max rank is 1") {
    for (rows <- samples(smallData, 8)) {
      val df = rows.zipWithIndex.map { case ((e, v), i) => (e, i.toLong, v) }
        .toDF("era", "id", "pred")
      val ranked = EraRank.withPctRankFirst(df, "r", col("era"), col("pred"), col("id"))
      val (lo, hi) = ranked.agg(min("r"), max("r")).as[(Double, Double)].head()
      assert(lo > 0.0 && hi <= 1.0)
      val maxPerEra = ranked.groupBy("era").agg(max("r").as("m"))
        .select("m").as[Double].collect()
      assert(maxPerEra.forall(_ == 1.0))
    }
  }

  test("property: corr is within [-1, 1] when defined") {
    for (rows <- samples(smallData, 8) if rows.size >= 2) {
      val df = rows.zipWithIndex.map { case ((e, v), i) => (e, v, v * i) }
        .toDF("era", "x", "y")
      val c = df.agg(corr(col("x"), col("y"))).head()
      if (!c.isNullAt(0)) {
        val v = c.getDouble(0)
        assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9)
      }
    }
  }

  test("property: random era folds are a disjoint exhaustive cover") {
    val gen = Gen.zip(Gen.choose(2, 12), Gen.choose(2, 5), Gen.choose(0L, 1000L))
    for ((nEras, k, seed) <- samples(gen, 8)) {
      val eras = (1L to nEras.toLong).toDF("era")
      val folds = Folds.eraKFoldRandom(eras, "era", k, seed).collect()
      assert(folds.map(_.getLong(0)).toSet == (1L to nEras.toLong).toSet)
      assert(folds.length == nEras)
      assert(folds.map(_.getLong(1)).forall(f => f >= 0 && f < k))
    }
  }

  test("property: sum/count aggregates are invariant under row permutation") {
    for (rows <- samples(smallData, 8)) {
      val df = rows.toDF("era", "v")
      val shuffled = new scala.util.Random(7).shuffle(rows).toDF("era", "v")
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.groupBy("era").agg(sum("v"), count(lit(1))).collect()
          .map(r => (r.getInt(0), math.rint(r.getDouble(1) * 1e6), r.getLong(2))).toSet
      assert(canon(df) == canon(shuffled))
    }
  }

  test("property: VI >= 0 and symmetric under swapping the columns") {
    val gen = Gen.nonEmptyListOf(Gen.zip(Gen.choose(0.0, 10.0), Gen.choose(0.0, 10.0)))
    for (rows <- samples(gen, 4)) {
      val df = rows.toDF("x", "y")
      def vi(a: String, b: String): Double =
        InfoTheory.variationOfInformation(
          InfoTheory.histogram2d(df, col(a), col(b), 0, 10, 0, 10, 4))
          .as[Double].head()
      val xy = vi("x", "y")
      val yx = vi("y", "x")
      assert(xy >= -1e-9)
      assert(math.abs(xy - yx) < 1e-9)
    }
  }
}
