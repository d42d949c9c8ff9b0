package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{SimilarityPack, TextPack}

/** Round-15 additions: filtered ANN (metadata-predicated vector
  * search) and the CCNet-style unigram-LM quality score. */
class FilteredSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("qAnnFiltered: every neighbor satisfies the metadata predicate") {
    val r = SimilarityPack.qAnnFiltered(spark, TestSpark.sf).cache()
    val labels = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("label").cast("long").as("lbl"))
    // neighbor label == query label (the join predicate really filtered)
    val bad = r.join(labels, r("n_id") === labels("vec_id"))
      .filter(col("label") =!= col("lbl")).count()
    assert(bad == 0)
    // ranks are 1..k consecutive per query and self never returned
    assert(r.filter(col("q_id") === col("n_id")).count() == 0)
    val perQ = r.groupBy("q_id")
      .agg(count(lit(1)).as("n"), max(col("rank")).as("mx"), min(col("rank")).as("mn"))
      .collect()
    assert(perQ.nonEmpty)
    perQ.foreach { row =>
      assert(row.getLong(3) == 1L, "rank starts at 1")
      assert(row.getLong(2) == row.getLong(1), "ranks consecutive")
    }
    r.unpersist()
  }

  test("qAnnFiltered is a pre-filter, not a post-filter of the unfiltered top-k") {
    // the classic filtered-ANN trap: post-filtering an unfiltered top-5
    // must lose rows for at least one query (neighbors of another label
    // occupied top-5 slots); the pre-filter form keeps k deep per slice
    val filtered = SimilarityPack.qAnnFiltered(spark, TestSpark.sf)
      .select(col("q_id"), col("n_id"))
    val labels = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("label").cast("long").as("lbl"))
    val post = SimilarityPack.qAnnCosine(spark, TestSpark.sf)
      .join(labels.withColumnRenamed("vec_id", "q_id")
        .withColumnRenamed("lbl", "q_lbl"), Seq("q_id"))
      .join(labels, col("n_id") === col("vec_id"))
      .filter(col("q_lbl") === col("lbl"))
      .select(col("q_id"), col("n_id"))
    val onlyInFiltered = filtered.except(post).count()
    assert(onlyInFiltered > 0,
      "pre-filter must surface same-label neighbors the unfiltered top-5 missed")
    // and post-filter survivors are always a subset of the pre-filter result
    assert(post.except(filtered).count() == 0)
  }

  test("qUnigramLogprob: terciles per language, scores negative, one row per doc") {
    val r = TextPack.qUnigramLogprob(spark, TestSpark.sf).cache()
    val nDocs = Tables.documents(spark, TestSpark.sf).count()
    assert(r.count() == nDocs)
    assert(r.select("doc_id").distinct().count() == nDocs)
    // a unigram probability is < 1, so every mean log-prob is negative
    assert(r.filter(col("logprob") >= 0).count() == 0)
    // ntile(3) bands differ by at most one doc within each language
    val bands = r.groupBy("lang", "band").agg(count(lit(1)).as("n"))
      .groupBy("lang").agg(max(col("n")).as("mx"), min(col("n")).as("mn"),
        count(lit(1)).as("nbands"))
      .collect()
    bands.foreach { row =>
      assert(row.getLong(3) == 3L, s"lang ${row.getString(0)} has 3 bands")
      assert(row.getLong(1) - row.getLong(2) <= 1L, "tercile sizes within 1")
    }
    // head docs score >= tail docs within every language
    val hd = r.filter(col("band") === "head")
      .groupBy("lang").agg(min(col("logprob")).as("h_min"))
    val tl = r.filter(col("band") === "tail")
      .groupBy("lang").agg(max(col("logprob")).as("t_max"))
    val inverted = hd.join(tl, "lang").filter(col("h_min") < col("t_max")).count()
    assert(inverted == 0)
    r.unpersist()
  }

  test("qUnigramLogprob: score equals hand-computed mean log p(w) for one doc") {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("lang"), col("text")).as[(Long, String, String)]
      .collect()
    val byLang = docs.groupBy(_._2)
    val (did, lang, text) = docs.minBy(_._1)
    val counts = byLang(lang).flatMap(_._3.split(" ")).groupBy(identity)
      .map { case (w, g) => w -> g.size.toLong }
    val total = counts.values.sum.toDouble
    val toks = text.split(" ")
    val expected = toks.map(w => math.log(counts(w) / total)).sum / toks.length
    val got = TextPack.qUnigramLogprob(spark, TestSpark.sf)
      .filter(col("doc_id") === did).select("logprob").head().getDouble(0)
    assert(math.abs(got - BigDecimal(expected)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("hard negatives: positive is the filtered-ANN rank-1; negative crosses labels") {
    import spark.implicits._
    val hn = graft.queries.SimilarityPack.qHardNegatives(spark, TestSpark.sf)
      .as[(Long, Long, Long, Double, Long, Long, Double, Double)].collect()
    assert(hn.length == 10)
    // the positive is BY DEFINITION qAnnFiltered's rank-1 row (same
    // label slice, same rounded-cos + vec_id order)
    val f1 = graft.queries.SimilarityPack.qAnnFiltered(spark, TestSpark.sf)
      .filter(col("rank") === 1).select(col("q_id"), col("n_id"), col("cos"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    hn.foreach { case (q, lbl, posId, cosPos, negId, negLbl, cosNeg, margin) =>
      assert(f1(q) == ((posId, cosPos)), s"anchor $q positive != filtered rank-1")
      assert(negLbl != lbl && negId != posId, s"anchor $q negative not cross-label")
      assert(margin == cosPos - cosNeg)
    }
  }

  test("embed outliers: bottom-3 per label, never an anchor's own nearest kin") {
    import spark.implicits._
    val out = graft.queries.SimilarityPack.qEmbedOutliers(spark, TestSpark.sf)
      .as[(Long, Long, Double, Long)].collect()
    val byLabel = out.groupBy(_._1)
    assert(byLabel.size == 10 && out.length == 30)
    byLabel.foreach { case (l, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == Seq(1L, 2L, 3L))
      assert(sorted.sliding(2).forall(w => w(0)._3 < w(1)._3 ||
        (w(0)._3 == w(1)._3 && w(0)._2 < w(1)._2)), s"label $l not ascending")
      assert(rows.forall(r => r._3 <= 1.0 && r._3 >= -1.0))
    }
  }
}
