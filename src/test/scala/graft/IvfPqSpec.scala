package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfPq, Pq}

/** The r14 IVF-PQ composition (Lloyd-fitted quality path): residual
  * encoding must beat flat PQ at the same codebook budget, the index
  * must partition the corpus exactly, search must stay within the
  * probed lists with usable recall, and the whole build must be
  * deterministic.
  */
class IvfPqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, TestSpark.sf)
  private lazy val index = IvfPq.build(emb, k = 16, m = 8, kc = 16, seed = 7L)

  private def reconstructionMse(ix: IvfPq.Index): Double = {
    val vecs = emb.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .join(ix.posting, "vec_id")
      .select(col("v"), col("cluster"), col("codes"))
      .as[(Array[Double], Int, Array[Int])]
    val cents = ix.centroids; val cb = ix.codebooks
    val subDim = cb(0)(0).length
    val (errSum, n) = vecs.collect().foldLeft((0.0, 0L)) {
      case ((acc, cnt), (v, ci, codes)) =>
        var err = 0.0
        var sub = 0
        while (sub < cb.length) {
          val cw = cb(sub)(codes(sub)); val off = sub * subDim
          var i = 0
          while (i < subDim) {
            val x = v(off + i) - (cents(ci)(off + i) + cw(i))
            err += x * x; i += 1
          }
          sub += 1
        }
        (acc + err, cnt + 1)
    }
    errSum / n
  }

  test("residual encoding beats flat PQ at the same codebook budget") {
    val flat = Pq.trainCodebooks(emb, m = 8, k = 16, sampleN = 2048)
    val flatMse = Pq.distortion(emb, flat)
    val ivfpqMse = reconstructionMse(index)
    assert(ivfpqMse < flatMse,
      s"residual PQ should reduce distortion: ivfpq=$ivfpqMse flat=$flatMse")
  }

  test("the posting relation partitions the corpus exactly once") {
    val n = emb.count()
    assert(index.posting.count() == n)
    assert(index.posting.select(col("vec_id")).distinct().count() == n)
    val bad = index.posting.filter(col("cluster") < 0 || col("cluster") >= 16)
    assert(bad.count() == 0)
    val badCode = index.posting
      .filter(exists(col("codes"), c => c < 0 || c >= 16))
    assert(badCode.count() == 0)
  }

  test("search returns a well-formed ranked relation on the fixture") {
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Array[Double])].collect()
    val got = IvfPq.search(index, queries, nprobe = 4, topK = 5)
    // exactly <= 5 ranked rows per query, ranks 1..n, no self-match
    val perQ = got.groupBy(col("q_id")).agg(count(lit(1)).as("n"),
      max(col("rank")).as("mx")).collect()
    assert(perQ.length == queries.length)
    assert(perQ.forall(r => r.getLong(1) <= 5 && r.getLong(2) == r.getLong(1)))
    assert(got.filter(col("q_id") === col("n_id")).count() == 0)
    // every returned candidate lives in one of the query's probed lists
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
      d
    }
    val clusterOf = index.posting.select(col("vec_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probedOf = queries.map { case (qid, qv) =>
      qid -> index.centroids.zipWithIndex
        .map { case (c, ci) => (ci, l2(qv, c)) }
        .sortBy(t => (t._2, t._1)).take(4).map(_._1).toSet
    }.toMap
    val escaped = got.select(col("q_id"), col("n_id")).collect()
      .filterNot(r => probedOf(r.getLong(0))(clusterOf(r.getLong(1))))
    assert(escaped.isEmpty, s"candidates outside probed lists: ${escaped.length}")
  }

  test("recall on near-dup-bearing clustered data: the domain ANN actually serves") {
    // two data regimes where recall is NOT measurable: the parquet
    // fixture (near-uniform noise — all pairwise distances
    // concentrate) and pure isotropic clusters (within a cluster every
    // member is a statistical tie — no quantizer can rank ties, and
    // "the" top-5 is arbitrary). The regime IVF-PQ exists for is
    // corpora with real structure: clusters AND genuinely-near items.
    // So: 16 separated centers, cluster noise 0.2, and 5 PLANTED
    // near-duplicates per query (noise 0.01) — the planted set is the
    // unambiguous exact top-5 and a working index must recover it.
    val rnd = new scala.util.Random(99)
    val centers = Array.tabulate(16, 64) { (c, i) =>
      if (i % 16 == c) 10.0 else 0.0
    }
    val base = (0L until 1000L).map { id =>
      val c = (id % 16).toInt
      val noise = Array.fill(64)(rnd.nextGaussian() * 0.2)
      (id, Array.tabulate(64)(i => centers(c)(i) + noise(i)))
    }
    val dups = (0L until 10L).flatMap { qid =>
      val qv = base(qid.toInt)._2
      (0 until 5).map { j =>
        (10000L + qid * 10 + j,
          Array.tabulate(64)(i => qv(i) + rnd.nextGaussian() * 0.01))
      }
    }
    val rows = base ++ dups
    val df = rows.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val ix = IvfPq.build(df, k = 16, m = 8, kc = 16, seed = 7L)
    val queries = base.take(10).map { case (id, v) => (id, v) }.toArray
    val got = IvfPq.search(ix, queries, nprobe = 4, topK = 5)
      .select(col("q_id"), col("n_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 10L).flatMap(q =>
      (0 until 5).map(j => (q, 10000L + q * 10 + j))).toSet
    val recall = expected.count(got.contains).toDouble / expected.size
    assert(recall >= 0.8, s"recall@5 of planted near-dups: $recall")
  }

  test("the build is deterministic") {
    val again = IvfPq.build(emb, k = 16, m = 8, kc = 16, seed = 7L)
    assert(index.posting.orderBy(col("vec_id")).collect().toSeq ==
      again.posting.orderBy(col("vec_id")).collect().toSeq)
  }

  test("exact refine: ranks by true cosine, repairs ADC order, stays inside the candidates") {
    val refined = graft.queries.SimilarityPack.qAnnRefine(spark, TestSpark.sf)
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(refined.nonEmpty)
    val byQ = refined.groupBy(_._1)
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1L to sorted.length))
      // refined order is exactly descending true cosine (n_id ties)
      assert(sorted.sliding(2).forall(w =>
        w(0)._4 > w(1)._4 || (w(0)._4 == w(1)._4 && w(0)._2 < w(1)._2)),
        s"query $q not in cosine order")
      assert(rows.forall(r => r._3 >= 1 && r._3 <= 20),
        s"query $q refined a vector outside the ADC top-20")
    }
    // the refine step must actually repair quantization error
    // somewhere on the fixture, else the stage is vacuous
    assert(refined.exists(r => r._3 != r._5),
      "every refined rank equals its ADC rank — refine changed nothing")
  }
}
