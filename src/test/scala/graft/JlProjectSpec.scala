package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilarityPack

/** JL random projection: the DuckDB oracle pins exact values; these
  * pin the construction — the sign family is non-degenerate, the
  * engine's projection matches a plain-Scala replay bit-for-bit, and
  * the lemma's distance-preservation actually holds on fixture pairs
  * (the property that makes the op worth running). */
class JlProjectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = SimilarityPack.qJlProject(spark, TestSpark.sf)
    .as[(Long, Double, Double, Double)].collect()

  private lazy val raw = Tables.embeddings(spark, TestSpark.sf)
    .select(col("vec_id"), transform(col("embedding"), _.cast("double")))
    .as[(Long, Seq[Double])].collect()
    .map { case (id, v) => (id, v.toArray) }

  /** corpus-mean-centered vectors, the relation the query projects */
  private lazy val vecs: Array[(Long, Array[Double])] = {
    val n = raw.length
    val mu = Array.tabulate(64)(p => raw.map(_._2(p)).sum / n)
    raw.map { case (id, v) =>
      (id, Array.tabulate(64)(p => v(p) - mu(p)))
    }
  }

  private def project(v: Array[Double]): Array[Double] =
    Array.tabulate(16) { j =>
      var acc = 0.0
      var p = 0
      while (p < v.length) { acc += v(p) * SimilarityPack.jlSign(p, j); p += 1 }
      acc
    }

  test("sign family is non-degenerate: 16 distinct, roughly balanced rows") {
    val signs = (0 until 16).map(j => SimilarityPack.jlSigns(j).toSeq)
    assert(signs.distinct.length == 16, "duplicate sign vectors across target dims")
    signs.zipWithIndex.foreach { case (sv, j) =>
      val pos = sv.count(_ > 0)
      assert(pos >= 16 && pos <= 48, s"dim $j sign row unbalanced: $pos/64 positive")
    }
    // the checkerboard failure mode: sign depending only on (pos+j) parity
    val checker = (0 until 16).forall(j => (0 until 64).forall(p =>
      SimilarityPack.jlSign(p, j) == (if ((p + j) % 2 == 0) 1 else -1)))
    assert(!checker, "sign family collapsed to the (pos+j) checkerboard")
  }

  test("engine norms match a plain-Scala replay of the same construction") {
    // the replay's corpus mean is summed in collect order, the
    // engine's in partial-agg order — identical to the last few ulps,
    // so compare against the UNROUNDED replay at 1e-5 (one grid step
    // of slack past the engine's round-6)
    val want = vecs.map { case (id, v) =>
      val pr = project(v)
      val o = v.map(x => x * x).sum
      val p = pr.map(x => x * x).sum / 16.0
      (id, o, p)
    }.sortBy(_._1)
    assert(rows.length == want.length)
    rows.zip(want).foreach { case (got, exp) =>
      assert(math.abs(got._2 - exp._2) < 1e-5 &&
        math.abs(got._3 - exp._3) < 1e-5, s"vec ${got._1}: $got vs $exp")
    }
  }

  test("norm and pairwise-distance distortion stay in the JL band") {
    // d' = 16 is aggressive (the lemma's ε at n=500 is loose); the
    // measured fixture distortion must still concentrate near 1
    // ratio ≈ χ²₁₆/16 (stdev ≈ 0.35): individual samples can stray
    // (fixture min ≈ 0.12 over 500 draws) — pin the mean, the bulk
    // concentration, and a loose absolute envelope, not the extremes
    val ratios = rows.map(_._4)
    val mean = ratios.sum / ratios.length
    assert(math.abs(mean - 1.0) < 0.15, f"mean norm ratio $mean%.3f far from 1")
    val inBulk = ratios.count(r => r > 0.5 && r < 1.8).toDouble / ratios.length
    assert(inBulk > 0.8, f"only $inBulk%.2f of norm ratios inside [0.5, 1.8]")
    assert(ratios.forall(r => r > 0.02 && r < 6.0),
      s"norm ratio outside [0.02, 6]: ${ratios.filter(r => r <= 0.02 || r >= 6.0).take(3).mkString(",")}")
    // pairwise distances over the first 20 vectors (190 pairs)
    val head = vecs.sortBy(_._1).take(20)
    val prs = head.map { case (id, v) => (id, v, project(v)) }
    val pairRatios = for {
      i <- prs.indices; k <- (i + 1) until prs.length
    } yield {
      val d2 = prs(i)._2.zip(prs(k)._2).map { case (a, b) => (a - b) * (a - b) }.sum
      val p2 = prs(i)._3.zip(prs(k)._3).map { case (a, b) => (a - b) * (a - b) }.sum / 16.0
      p2 / d2
    }
    val pm = pairRatios.sum / pairRatios.length
    assert(math.abs(pm - 1.0) < 0.15, f"mean pair-distance ratio $pm%.3f far from 1")
    assert(pairRatios.forall(r => r > 0.05 && r < 6.0), "a pair distorted beyond 6x")
  }
}
