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

  test("langid predicts by argmax over all languages, not each-vs-English") {
    // s_de=5 > s_es=3 > s_en=0: the old when-chain compared each
    // language only against English in fixed order and mislabeled
    // this doc "es"; argmax must say "de"
    val docs = Seq(
      (1L, "de", "der die und das ist el la es"),
      (2L, "en", "the a of and is"),
      (3L, "fr", "le les et est der"),
      (4L, "xx", "zzz qqq www")) // no markers at all -> en fallback
      .toDF("doc_id", "lang", "text")
    val got = graft.queries.TextPack.langidScore(docs)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(got(1L) == "de")
    assert(got(2L) == "en")
    assert(got(3L) == "fr")
    assert(got(4L) == "en")
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

  test("norm-VI on a degenerate single-cell joint is 0.0, not NaN/NULL") {
    // All mass in one (bi, bj) cell: H(X,Y) = 0 and VI = 0, so the
    // naive VI/H(X,Y) is 0/0. The guard must emit exactly 0.0 — the
    // same value the oracle's CASE WHEN renders — because NaN/NULL
    // rendering differs between Spark and DuckDB.
    val const = Seq.fill(50)((3.0, 3.0)).toDF("x", "y")
    val joint = InfoTheory.histogram2d(const, col("x"), col("y"), 0, 7, 0, 7, 5)
    assert(joint.count() == 1) // genuinely degenerate
    val got = InfoTheory.variationOfInformation(joint, norm = true)
      .as[Double].head()
    assert(!got.isNaN)
    assert(got == 0.0)
    // and the unnormalized path stays finite-zero on the same joint
    val vi = InfoTheory.variationOfInformation(joint).as[Double].head()
    assert(math.abs(vi) < 1e-9)
  }

  test("histogram2d counts sum to row count and buckets are clamped") {
    val df = Seq(-5.0, 0.0, 2.5, 5.0, 99.0).map(x => (x, x)).toDF("x", "y")
    val h = InfoTheory.histogram2d(df, col("x"), col("y"), 0, 5, 0, 5, 5)
    assert(h.agg(sum("n")).as[Long].head() == 5)
    val buckets = h.select("bi").as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b <= 4))
  }

  test("minhash estimate covers exactly the LSH candidate pairs, est in range") {
    val est = graft.queries.TextPack.qMinhashEst(spark, TestSpark.sf)
      .select("a", "b", "n_match").collect()
    val lsh = graft.queries.TextPack.qMinhashLsh(spark, TestSpark.sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(est.map(r => (r.getLong(0), r.getLong(1))).toSet == lsh)
    // a shared band means both of that band's components match, so
    // every candidate pair has at least 2 of 16 matching minhashes
    assert(est.forall(r => r.getLong(2) >= 2 && r.getLong(2) <= 16))
  }

  test("int8 quantization error is bounded by half a step per component") {
    val rows = graft.queries.SimilarityPack.qEmbedQuantize(spark, TestSpark.sf)
      .select("max_abs", "sse").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (maxAbs, sse) = (r.getDouble(0), r.getDouble(1))
      assert(maxAbs > 0 && sse >= 0)
      // 64 components, each within (step/2) = max_abs/254 of its
      // dequantized value (floor(x+0.5) is nearest-int)
      val bound = 64 * math.pow(maxAbs / 254.0, 2) * (1 + 1e-9) + 1e-6
      assert(sse <= bound, s"sse=$sse bound=$bound")
    }
  }

  test("bigram LM: one row per multi-word doc, n_bi = words-1, scores negative") {
    val docs = graft.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"),
        size(split(col("text"), " ", -1)).cast("long").as("n_words"))
      .as[(Long, Long)].collect().toMap
    val got = graft.queries.TextPack.qBigramLogprob(spark, TestSpark.sf)
      .as[(Long, String, Long, Double)].collect()
    // every doc with >= 2 words contributes exactly its words-1 bigrams
    assert(got.map(_._1).toSet == docs.filter(_._2 >= 2).keySet)
    got.foreach { case (id, _, nBi, lp) =>
      assert(nBi == docs(id) - 1, s"n_bi($id)")
      // q = 0.75 P(w|a) + 0.25 P(w) is a strict sub-distribution of
      // probabilities < 1 on any corpus with >= 2 distinct bigrams,
      // so every mean log-probability is negative
      assert(lp < 0.0, s"bi_logprob($id) = $lp")
    }
    // interpolation floor: a doc's score can never be below
    // ln(0.25 * c_min/N) of its language — the backoff term alone
    val minUni = math.log(0.25 / docs.values.sum.toDouble)
    assert(got.forall(_._4 >= minUni))
  }
}
