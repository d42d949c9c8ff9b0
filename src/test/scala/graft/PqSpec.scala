package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pq

/** Product quantization: encoding contract, determinism, and the
  * distortion guarantee that makes PQ better than the trivial
  * one-codeword quantizer. */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = Tables.embeddings(spark, TestSpark.sf)

  test("encode: 8 codes per vector, all within [0, 16), all rows kept") {
    val cb = Pq.trainCodebooks(emb, m = 8, k = 16, sampleN = 256)
    val codes = Pq.encode(emb, cb).collect()
    assert(codes.length == emb.count())
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 8)
      assert(cs.forall(c => c >= 0 && c < 16))
    }
  }

  test("training and encoding are deterministic") {
    val cb1 = Pq.trainCodebooks(emb, m = 8, k = 16, sampleN = 256)
    val cb2 = Pq.trainCodebooks(emb, m = 8, k = 16, sampleN = 256)
    assert(cb1.flatten.flatten.toSeq == cb2.flatten.flatten.toSeq)
    val c1 = Pq.encode(emb, cb1).orderBy("vec_id").collect().map(_.getSeq[Int](1))
    val c2 = Pq.encode(emb, cb2).orderBy("vec_id").collect().map(_.getSeq[Int](1))
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }

  test("16-codeword distortion beats the one-codeword baseline") {
    val cb16 = Pq.trainCodebooks(emb, m = 8, k = 16, sampleN = 256)
    val cb1 = Pq.trainCodebooks(emb, m = 8, k = 1, sampleN = 256)
    val d16 = Pq.distortion(emb, cb16)
    val d1 = Pq.distortion(emb, cb1)
    assert(d16 > 0 && d1 > 0)
    assert(d16 < d1, s"PQ(16) distortion $d16 not below 1-codeword $d1")
  }

  test("q_ann_pq: one recall row per query, recall in [0, 1]") {
    val rows = graft.queries.SimilarityPack.qAnnPq(spark, TestSpark.sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val rec = r.getDouble(1)
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }
}
