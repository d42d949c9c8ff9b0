package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SignLshSig

/** The fused sign-LSH kernel must be bit-identical to the
  * aggregate(zip_with) lambda composition it replaced (same plane
  * family, same ascending accumulation order) — and the plane family
  * itself must be non-degenerate (the r12 probe caught the previous
  * linear-mod-7 family at 49 distinct planes → quadratic pairs). */
class SignLshSigSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lambdaSig(v: org.apache.spark.sql.Column, bits: Int, band: Int) =
    (0 until bits).map { j =>
      val q = band * 64 + j
      val dj = aggregate(
        zip_with(v, sequence(lit(1L), size(v).cast("long")),
          (x, p) => x * ((p * lit(1000003L) + lit(q.toLong)) * lit(2654435761L)
            % lit(4294967296L) % lit(7L) - lit(3L)).cast("double")),
        lit(0.0), (acc, x) => acc + x)
      when(dj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  test("kernel equals the lambda composition on fixture embeddings (4 bands, 8 bits)") {
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val both = e.select(
      col("vec_id"),
      SignLshSig.sign_lsh_sig(col("v"), 8, 4).as("fused"),
      array((0 until 4).map(b => lambdaSig(col("v"), 8, b)): _*).as("composed"))
    val bad = both.filter(not(col("fused") === col("composed"))).count()
    assert(bad == 0)
  }

  test("kernel handles 13-bit width and empty/edge vectors") {
    val vs = Seq(
      (1L, Seq.empty[Double]),
      (2L, Seq(0.0)),
      (3L, Seq(-1.5, 2.5, 0.0, 3.25)),
    ).toDF("id", "v")
    val got = vs.select(col("id"), SignLshSig.sign_lsh_sig(col("v"), 13, 2).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    // empty vector: all dots 0, no bit set
    assert(got(1L) == Seq(0L, 0L))
    assert(got.values.forall(_.length == 2))
    // reference reimplementation
    def ref(v: Seq[Double], bits: Int, band: Int): Long =
      (0 until bits).map { j =>
        val d = v.zipWithIndex.map { case (x, p) =>
          x * (((p + 1).toLong * 1000003L + band * 64L + j) * 2654435761L
            % 4294967296L % 7L - 3L)
        }.sum
        if (d > 0) 1L << j else 0L
      }.sum
    for ((id, v) <- Seq((2L, Seq(0.0)), (3L, Seq(-1.5, 2.5, 0.0, 3.25))))
      assert(got(id) == Seq(ref(v, 13, 0), ref(v, 13, 1)), s"id $id")
  }

  test("planted near-dups collide on >=1 of 4 bands (the S-curve's high end)") {
    // the other half of the banded contract: non-degeneracy bounds
    // candidates (test below), but the construction is only a near-dup
    // DETECTOR if true near-dups actually reach the verify stage. The
    // fixture has no planted pairs (max cosine ~0.51), so plant them:
    // each vector gets a seeded ~0.5%-relative perturbation
    // (cosine >= 0.999 by construction) and the pair must agree on at
    // least one full 8-bit band signature. Sign-LSH theory at
    // cos 0.999 gives p_band = (1 - theta/pi)^8 ~ 0.92 per band,
    // ~1 - 3e-5 for the 4-band OR; 0.95 leaves room for the
    // integer-plane family's deviation from ideal hyperplanes.
    val rnd = new scala.util.Random(42)
    val base = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect()
    val planted = base.map { case (id, v) =>
      val norm = math.sqrt(v.map(x => x * x).sum)
      (id, v, v.map(x => x + 0.005 * norm / math.sqrt(v.length) * rnd.nextGaussian()))
    }
    val df = planted.toSeq.toDF("id", "a", "b")
      .select(col("id"),
        SignLshSig.sign_lsh_sig(col("a"), 8, 4).as("sa"),
        SignLshSig.sign_lsh_sig(col("b"), 8, 4).as("sb"))
      .withColumn("hit", exists(zip_with(col("sa"), col("sb"), _ === _), x => x))
    val n = planted.length
    val hits = df.filter(col("hit")).count()
    assert(hits >= (0.95 * n).toLong, s"only $hits/$n planted pairs collide on a band")
  }

  test("planeWeight is mod-2^32-exact past the naive Long ceiling (pos ~3.4e3)") {
    // the naive (pos*1000003 + q) * 2654435761 leaves Long range at
    // pos ~3470; the masked kernel must keep computing the spec'd
    // (((pos*1000003 + q) * 2654435761) mod 2^32) mod 7 - 3 exactly —
    // a vector longer than ~3400 elements must not silently wrap
    def ref(pos: Long, q: Long): Long =
      (((BigInt(pos) * 1000003 + q) * BigInt(2654435761L))
        .mod(BigInt(4294967296L)) % 7).toLong - 3L
    val positions =
      (1L to 64L) ++ Seq(3469L, 3470L, 3471L, 5000L, 65536L, 1000000L, Int.MaxValue.toLong)
    for (pos <- positions; q <- Seq(0L, 1L, 63L, 255L, 256L))
      assert(SignLshSig.planeWeight(pos, q) == ref(pos, q), s"pos=$pos q=$q")
    // overflow really bites there: the naive form disagrees somewhere
    // in the large-pos sweep (guards against the masked form silently
    // reverting)
    def naive(pos: Long, q: Long): Long =
      ((pos * 1000003L + q) * 2654435761L % 4294967296L) % 7L - 3L
    assert(Seq(5000L, 65536L, 1000000L).exists(p => naive(p, 0L) != ref(p, 0L)))
  }

  test("plane family is non-degenerate: distinct sign behavior beyond 7 planes") {
    // with the old linear-mod-7 family, planes q and q+7 were equal;
    // the scrambled family must produce >128 distinct 13-bit buckets
    // on the 2000-vector fixture (measured 960)
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
    val n = e.select(element_at(SignLshSig.sign_lsh_sig(col("v"), 13, 1), 1).as("b"))
      .distinct().count()
    assert(n > 128, s"only $n distinct 13-bit buckets — plane family degenerate")
  }
}
