package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Reduction

/** F8: the RowMatrix SVD must agree with the PCA eigendecomposition it
  * sits next to — σᵢ²/(n−1) of the CENTERED sample are exactly the
  * covariance eigenvalues PCA reports (as explained-variance
  * proportions × total variance). Plus the q_svd query contracts.
  */
class SvdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sigma^2/(n-1) of the centered sample equals the PCA eigenvalues") {
    import spark.implicits._
    // deterministic, well-conditioned 40×3 sample with cross-correlation
    val rows = (1 to 40).map { i =>
      val a = math.sin(i * 1.7)
      val b = math.cos(i * 0.9) * 2.0
      val c = 0.5 * a - 0.25 * b + math.sin(i * 3.1) * 0.1
      (i.toLong, a, b, c)
    }
    val df = rows.toDF("id", "f0", "f1", "f2")
    val feats = Seq("f0", "f1", "f2")
    val m = df.agg(avg(col("f0")), avg(col("f1")), avg(col("f2"))).head()
    val centered = df.select(col("id") +:
      feats.zipWithIndex.map { case (f, i) => (col(f) - m.getDouble(i)).as(f) }: _*)
    val (svd, n) = Reduction.svdOnHead(centered, feats, nFit = 40, orderCol = "id")
    val fromSvd = svd.s.toArray.map(s => s * s / (n - 1))

    val (_, pca) = Reduction.pcaFitTransformOnHead(df, feats, k = 3,
      nFit = 40, orderCol = "id")
    val trace = df.agg(
      (var_samp(col("f0")) + var_samp(col("f1")) + var_samp(col("f2"))).as("t"))
      .head().getDouble(0)
    val fromPca = pca.explainedVariance.toArray.map(_ * trace)

    assert(fromSvd.length == 3 && fromPca.length == 3)
    fromSvd.zip(fromPca).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-8, s"$a vs $b")
    }
  }

  test("q_svd_topk: full descending spectrum, q_svd_invariants green shape") {
    val topk = graft.queries.MlPack.qSvdTopk(spark, TestSpark.sf).collect()
    assert(topk.length == 8)
    val sigmas = topk.sortBy(_.getLong(0)).map(_.getDouble(1))
    assert(sigmas.zip(sigmas.drop(1)).forall { case (a, b) => a >= b })
    assert(sigmas.forall(s => s >= 0 && !s.isNaN))

    val inv = graft.queries.MlPack.qSvdInvariants(spark, TestSpark.sf).head()
    assert(inv.getLong(1) == 1L, "sigma_desc")
    assert(inv.getDouble(2) == 0.0, "v_ortho_resid")
    // Σσ² must reconstruct the Frobenius norm the oracle computes —
    // re-derive it here from the same head sample
    // first 8 embedding components only — the featureFrame slice
    val frob = Tables.embeddings(spark, TestSpark.sf)
      .orderBy(col("vec_id")).limit(500)
      .select(posexplode(col("embedding")).as(Seq("p", "x")))
      .filter(col("p") < 8)
      .agg(sum(col("x").cast("double") * col("x").cast("double")).as("f"))
      .head().getDouble(0)
    assert(math.abs(inv.getDouble(0) - frob) < 1e-3, s"${inv.getDouble(0)} vs $frob")
  }
}
