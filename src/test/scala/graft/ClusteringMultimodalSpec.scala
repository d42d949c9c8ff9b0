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

  // expected raster facts straight from the generator's closed form
  private def expectedSum(d: Long, frame: Int = 0): Long = {
    val w = Multimodal.widthOf(d); val h = Multimodal.heightOf(d)
    val v = Multimodal.fillOf(d)
    (0 until h).map(y => w.toLong * ((v + 17 * frame + y) % 256)).sum
  }

  test("decodeBatch really decodes: synth PNG facts match the closed form") {
    val df = Seq(0L, 7L, 123L)
      .map(d => (d, Multimodal.synthPng(d))).toDF("doc_id", "payload")
    val got = Multimodal.decodeBatch(df).collect().sortBy(_.doc_id)
    for (m <- got) {
      val d = m.doc_id
      assert(m.img_w.contains(Multimodal.widthOf(d).toLong))
      assert(m.img_h.contains(Multimodal.heightOf(d).toLong))
      assert(m.px_sum.contains(expectedSum(d)))
    }
  }

  private def pngOf(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("decodeImage adversarial: 1x1, 1000x1 wide, truncated, junk, empty") {
    val one = new java.awt.image.BufferedImage(
      1, 1, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    one.getRaster.setSample(0, 0, 0, 42)
    assert(Multimodal.decodeImage(pngOf(one))
      .contains(Multimodal.Decoded(1, 1, 42L, 42, 42)))

    val wide = new java.awt.image.BufferedImage(
      1000, 1, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until 1000).foreach(x => wide.getRaster.setSample(x, 0, 0, x % 256))
    val dw = Multimodal.decodeImage(pngOf(wide)).get
    assert(dw.width == 1000 && dw.height == 1)
    assert(dw.pxSum == (0 until 1000).map(_ % 256).sum.toLong)

    // truncated: PNG magic engages the reader, body is missing -> None
    assert(Multimodal.decodeImage(Multimodal.synthPng(5L).take(8)).isEmpty)
    // half an image: reader engages, inflate fails mid-stream -> None
    val full = Multimodal.synthPng(9L)
    assert(Multimodal.decodeImage(full.take(full.length / 2)).isEmpty)
    assert(Multimodal.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
  }

  test("decodeBatch keeps corrupt payloads as null rows (no task failure)") {
    val df = Seq(
      (1L, Multimodal.synthPng(1L)),
      (2L, Multimodal.synthPng(2L).take(8)),
    ).toDF("doc_id", "payload")
    val got = Multimodal.decodeBatch(df).collect().sortBy(_.doc_id)
    assert(got.length == 2)
    assert(got(0).img_w.isDefined && got(1).img_w.isEmpty)
    assert(got(1).px_sum.isEmpty)
  }

  test("resizeImage: nearest-neighbor /2 measured from the actual raster") {
    val d = 11L
    val r = Multimodal.resizeImage(Multimodal.synthPng(d), 2).get
    val w = Multimodal.widthOf(d); val h = Multimodal.heightOf(d)
    val v = Multimodal.fillOf(d)
    assert(r.width == (w + 1) / 2 && r.height == (h + 1) / 2)
    // resized pixel (x', y') samples source row 2y'
    val expect = (0 until (h + 1) / 2)
      .map(y => ((w + 1) / 2).toLong * ((v + 2 * y) % 256)).sum
    assert(r.pxSum == expect)
    assert(Multimodal.resizeImage("junk".getBytes, 2).isEmpty)
    intercept[IllegalArgumentException](Multimodal.resizeImage(Array[Byte](1), 0))
  }

  test("frameSample seeks and decodes every stride-th REAL frame") {
    val d = 4L // framesOf(4) == 5 -> sampled frames 0, 2, 4
    val m = Multimodal.MediaPayload(d, Multimodal.synthContainer(d))
    val frames = Multimodal.frameSample(m, 2).toSeq
    assert(frames.map(_.frame_idx) == Seq(0L, 2L, 4L))
    for (f <- frames) {
      assert(f.frame_w == Multimodal.widthOf(d).toLong)
      assert(f.frame_h == Multimodal.heightOf(d).toLong)
      assert(f.frame_px_sum == expectedSum(d, f.frame_idx.toInt))
    }
    // non-container payload -> empty, not a crash
    assert(Multimodal.frameSample(
      Multimodal.MediaPayload(1L, Multimodal.synthPng(1L)), 2).isEmpty)
    assert(Multimodal.frameSample(
      Multimodal.MediaPayload(1L, Array[Byte](1, 2)), 2).isEmpty)
  }

  test("containerMeta walks the header and decodes frame 0 only") {
    val d = 8L
    val got = Multimodal.containerMeta(
      Multimodal.MediaPayload(d, Multimodal.synthContainer(d))).get
    assert(got.width == Multimodal.widthOf(d).toLong)
    assert(got.height == Multimodal.heightOf(d).toLong)
    assert(got.n_frames == Multimodal.framesOf(d).toLong)
    val c = Multimodal.synthContainer(d)
    assert(Multimodal.containerMeta(
      Multimodal.MediaPayload(d, c.take(c.length / 2))).isEmpty)
  }

  test("extractFeaturesBatch: raster min/max/sum from a real decode") {
    val d = 3L
    val df = Seq((d, Multimodal.synthPng(d))).toDF("doc_id", "payload")
    val f = Multimodal.extractFeaturesBatch(df).collect().head
    val w = Multimodal.widthOf(d); val h = Multimodal.heightOf(d)
    val v = Multimodal.fillOf(d)
    val rowVals = (0 until h).map(y => (v + y) % 256)
    assert(f.n_pixels == w.toLong * h)
    assert(f.px_sum == expectedSum(d))
    assert(f.px_min == rowVals.min.toLong && f.px_max == rowVals.max.toLong)
  }
}
