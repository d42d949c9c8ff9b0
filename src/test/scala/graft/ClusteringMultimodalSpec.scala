package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Clustering
import graft.operators.Multimodal

class ClusteringMultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("agglomerate: two obvious blobs separate at k=2") {
    // indices 0-2 mutually close, 3-5 mutually close, blocks far apart
    val n = 6
    val d = Array.tabulate(n, n) { (i, j) =>
      if (i == j) 0.0
      else if ((i < 3) == (j < 3)) 0.1 else 1.0
    }
    val labels = Clustering.agglomerate(d, 2)
    assert(labels.take(3).toSet.size == 1)
    assert(labels.drop(3).toSet.size == 1)
    assert(labels(0) != labels(3))
    val sil = Clustering.silhouette(d, labels)
    assert(sil > 0.7)
    val (bestK, _, _) = Clustering.optimalClusters(d, Seq(2, 3, 4))
    assert(bestK == 2)
  }

  test("single-label input: silhouette is -1.0, silhouetteTerms fails loudly") {
    val d = Array.tabulate(3, 3)((i, j) => if (i == j) 0.0 else 0.5)
    val oneLabel = Array(0, 0, 0)
    assert(Clustering.silhouette(d, oneLabel) == -1.0)
    val e = intercept[IllegalArgumentException](
      Clustering.silhouetteTerms(d, oneLabel))
    assert(e.getMessage.contains("2 clusters"))
  }

  test("buildInit: first medoid minimizes total distance, second maximizes reduction") {
    // point 1 is central (total 0.2+0.2=0.4 smallest); after picking
    // it, point 3 (far block) reduces cost most
    val d = Array(
      Array(0.0, 0.2, 0.4, 1.0),
      Array(0.2, 0.0, 0.2, 1.0),
      Array(0.4, 0.2, 0.0, 1.0),
      Array(1.0, 1.0, 1.0, 0.0))
    assert(Clustering.buildInit(d, 1) == Seq(1))
    assert(Clustering.buildInit(d, 2) == Seq(1, 3))
    // ties break by smaller index: all-equidistant points
    val u = Array.tabulate(3, 3)((i, j) => if (i == j) 0.0 else 1.0)
    assert(Clustering.buildInit(u, 2) == Seq(0, 1))
  }

  test("dbscan: separates blobs, marks isolated points noise, deterministic") {
    // indices 0-2 one blob, 3-5 another, 6 isolated far from both
    val n = 7
    val d = Array.tabulate(n, n) { (i, j) =>
      if (i == j) 0.0
      else if (i == 6 || j == 6) 5.0
      else if ((i < 3) == (j < 3)) 0.1 else 1.0
    }
    val labels = Clustering.dbscan(d, eps = 0.2, minPts = 3)
    assert(labels.take(3).toSet.size == 1)
    assert(labels.slice(3, 6).toSet.size == 1)
    assert(labels(0) != labels(3))
    assert(labels(6) == -1) // noise
    assert(labels.toSeq == Clustering.dbscan(d, 0.2, 3).toSeq)
    // the scan includes the density family and stays deterministic
    val s1 = Clustering.optimalClustersScan(d, Seq(2, 3))
    val s2 = Clustering.optimalClustersScan(d, Seq(2, 3))
    assert(s1._1 == s2._1 && s1._2 == s2._2 && s1._3.toSeq == s2._3.toSeq)
  }

  test("hdbscan: blobs cluster, isolated point is noise, deterministic") {
    val n = 9
    // two 4-point blobs + 1 far outlier; within-blob 0.1, across 1.0
    val d = Array.tabulate(n, n) { (i, j) =>
      if (i == j) 0.0
      else if (i == 8 || j == 8) 5.0
      else if ((i < 4) == (j < 4)) 0.1 else 1.0
    }
    val labels = Clustering.hdbscan(d, minClusterSize = 3, minSamples = 3)
    assert(labels.take(4).toSet.size == 1, labels.mkString(","))
    assert(labels.slice(4, 8).toSet.size == 1, labels.mkString(","))
    assert(labels(0) != labels(4))
    assert(labels(0) >= 0 && labels(4) >= 0)
    assert(labels(8) == -1)
    assert(labels.toSeq == Clustering.hdbscan(d, 3, 3).toSeq)
  }

  test("hdbscan: uniform distances yield no structure (all noise)") {
    // no density gradient -> the condensed tree is root-only ->
    // allow_single_cluster=False leaves everything unlabeled
    val n = 6
    val d = Array.tabulate(n, n)((i, j) => if (i == j) 0.0 else 1.0)
    assert(Clustering.hdbscan(d, 2, 2).toSet == Set(-1))
  }

  test("hdbscan: nested densities prefer the stable fine clusters") {
    // two tight pairs inside a loose 4-blob, plus a distant tight trio:
    // stability must pick the trio and the loose blob structure
    val n = 7
    val d = Array.tabulate(n, n) { (i, j) =>
      if (i == j) 0.0
      else if (i < 4 && j < 4) { if ((i < 2) == (j < 2)) 0.1 else 0.4 }
      else if (i >= 4 && j >= 4) 0.1
      else 3.0
    }
    val labels = Clustering.hdbscan(d, minClusterSize = 2, minSamples = 2)
    // the trio is one cluster
    assert(labels.slice(4, 7).toSet.size == 1 && labels(4) >= 0)
    // the two tight pairs are separated from each other
    assert(labels(0) == labels(1) && labels(2) == labels(3))
    assert(labels(0) != labels(4))
  }

  test("dbscan/epsFor degenerate inputs: identical points, tiny n") {
    // all points identical -> every point core -> one cluster, no noise
    val same = Array.fill(4, 4)(0.0)
    assert(Clustering.dbscan(same, eps = 0.1, minPts = 2).toSet == Set(0))
    assert(Clustering.epsFor(same, 2) == 0.0)
    // minPts beyond n: nobody is core -> all noise
    val d2 = Array(Array(0.0, 1.0), Array(1.0, 0.0))
    assert(Clustering.dbscan(d2, eps = 0.1, minPts = 5).toSet == Set(-1))
    // epsFor index clamps at n-1
    assert(Clustering.epsFor(d2, 5) == 1.0)
  }

  test("decodeBatch: typed mapPartitions path equals the scalar stub") {
    val df = Seq((1L, "hello"), (2L, "a longer document body"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val got = Multimodal.decodeBatch(df).collect().sortBy(_.doc_id)
    assert(got(0) == Multimodal.decodeMeta(
      Multimodal.MediaPayload(1L, "hello".getBytes("UTF-8"))))
    assert(got(0).byte_len == 5 && got(0).width == 21 && got(0).n_frames == 1 + 'h' % 8)
  }

  test("resizeStub keeps ceil(len/factor) bytes and measures the result") {
    val m = Multimodal.MediaPayload(7L, Array.tabulate(11)(_.toByte))
    val r = Multimodal.resizeStub(m, 2)
    assert(r.out_len == 6) // indices 0,2,4,6,8,10
    assert(r.out_width == 16 + 6 % 320 && r.out_height == 16 + 30 % 240)
    assert(Multimodal.resizeStub(Multimodal.MediaPayload(8L, Array.empty), 2)
      .out_len == 0)
  }

  test("frameSample explodes to every stride-th frame with monotone offsets") {
    val m = Multimodal.MediaPayload(3L, "xabcdefgh".getBytes("UTF-8"))
    val frames = Multimodal.frameSample(m, 2).toSeq
    val nFrames = 1 + ('x' & 0xffL) % 8
    assert(frames.map(_.frame_idx) == (0L until nFrames by 2L).toSeq)
    assert(frames.map(_.frame_off) == frames.map(_.frame_off).sorted)
    assert(frames.forall(f => f.frame_sig >= 0 && f.frame_sig < 256))
  }

  test("extractFeatures counts codepoints by ASCII class") {
    val f = Multimodal.extractFeatures(
      Multimodal.MediaPayload(9L, "ab 12 的!".getBytes("UTF-8")))
    assert(f.n_alpha == 2 && f.n_digit == 2 && f.n_space == 2)
    assert(f.n_other == 2) // CJK char + '!' are single codepoints
    assert(f.n_bytes == "ab 12 的!".getBytes("UTF-8").length)
  }
}
