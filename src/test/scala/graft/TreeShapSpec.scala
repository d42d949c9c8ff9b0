package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.RandomForestRegressor

import graft.ml.TreeShap
import graft.ml.TreeShap.ShapTree

/** TreeSHAP (M10): the fast path-attribution must equal the
  * subset-enumeration Shapley ground truth on hand-built trees, and
  * satisfy additivity (Σφ + base = prediction) on a real MLlib forest.
  */
class TreeShapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def approx(a: Double, b: Double, eps: Double = 1e-9) =
    assert(math.abs(a - b) < eps, s"$a vs $b")

  test("single-split tree: phi is the full hot-vs-expectation gap") {
    // split f0 <= 0: left value 1 (cover 3), right value 3 (cover 1)
    val t = ShapTree(
      feature = Array(0, -1, -1), threshold = Array(0.0, 0, 0),
      left = Array(1, -1, -1), right = Array(2, -1, -1),
      value = Array(0.0, 1.0, 3.0), cover = Array(4.0, 3.0, 1.0))
    approx(t.expectedValue, 1.5)
    val phi = TreeShap.shapValues(t, Array(0.7, 9.9), 2)
    approx(phi(0), 3.0 - 1.5)
    approx(phi(1), 0.0)
    val phiL = TreeShap.shapValues(t, Array(-0.7, 9.9), 2)
    approx(phiL(0), 1.0 - 1.5)
  }

  // depth-2 tree on two features with asymmetric covers
  private val twoFeat = ShapTree(
    feature = Array(0, 1, 1, -1, -1, -1, -1),
    threshold = Array(0.0, -0.5, 0.5, 0, 0, 0, 0),
    left = Array(1, 3, 5, -1, -1, -1, -1),
    right = Array(2, 4, 6, -1, -1, -1, -1),
    value = Array(0, 0, 0, 10.0, 20.0, 30.0, 40.0),
    cover = Array(10.0, 6.0, 4.0, 2.0, 4.0, 3.0, 1.0))

  test("fast path equals brute-force Shapley (two features)") {
    for (x <- Seq(Array(-1.0, -1.0), Array(-1.0, 0.0), Array(1.0, 0.0),
                  Array(1.0, 0.9), Array(0.0, -0.5))) {
      val fast = TreeShap.shapValues(twoFeat, x, 2)
      val brute = TreeShap.bruteForceShap(twoFeat, x, 2)
      fast.indices.foreach(i => approx(fast(i), brute(i)))
      approx(fast.sum, twoFeat.predict(x) - twoFeat.expectedValue)
    }
  }

  test("fast path equals brute force when a feature repeats on a path") {
    // f0 at the root AND again on the left branch (the FINDFIRST/UNWIND arm)
    val t = ShapTree(
      feature = Array(0, 0, 1, -1, -1, -1, -1),
      threshold = Array(0.0, -1.0, 2.0, 0, 0, 0, 0),
      left = Array(1, 3, 5, -1, -1, -1, -1),
      right = Array(2, 4, 6, -1, -1, -1, -1),
      value = Array(0, 0, 0, 5.0, 7.0, 11.0, 13.0),
      cover = Array(12.0, 8.0, 4.0, 3.0, 5.0, 1.0, 3.0))
    for (x <- Seq(Array(-2.0, 0.0), Array(-0.5, 0.0), Array(1.0, 1.0),
                  Array(1.0, 3.0))) {
      val fast = TreeShap.shapValues(t, x, 3)
      val brute = TreeShap.bruteForceShap(t, x, 3)
      fast.indices.foreach(i => approx(fast(i), brute(i)))
      approx(fast.sum, t.predict(x) - t.expectedValue)
    }
  }

  test("zero-cover branch neither poisons nor contributes") {
    // right child unseen by the background sample
    val t = ShapTree(
      feature = Array(0, -1, -1), threshold = Array(0.0, 0, 0),
      left = Array(1, -1, -1), right = Array(2, -1, -1),
      value = Array(0.0, 1.0, 3.0), cover = Array(5.0, 5.0, 0.0))
    approx(t.expectedValue, 1.0)
    val phi = TreeShap.shapValues(t, Array(1.0), 1)
    assert(!phi(0).isNaN)
    approx(phi(0), 3.0 - 1.0)
  }

  test("MLlib forest: additivity and brute-force agreement per tree") {
    import spark.implicits._
    val n = 400
    val rows = (0 until n).map { i =>
      val x0 = (i % 20) / 10.0 - 1.0
      val x1 = ((i * 7) % 13) / 6.0 - 1.0
      val x2 = ((i * 3) % 5) / 2.0 - 1.0
      (x0, x1, x2, 2.0 * x0 + x1 * x1 - 0.5 * x2 + 0.1 * x0 * x1)
    }
    val df = rows.toDF("x0", "x1", "x2", "y")
    val va = new VectorAssembler()
      .setInputCols(Array("x0", "x1", "x2")).setOutputCol("fv")
    val model = new RandomForestRegressor()
      .setFeaturesCol("fv").setLabelCol("y").setNumTrees(5)
      .setMaxDepth(4).setSeed(7).fit(va.transform(df))
    val feats = rows.map(r => Array(r._1, r._2, r._3)).toArray
    val sample = feats.take(50)
    val (phis, base) = TreeShap.forestShap(model, sample, feats, 3)
    sample.zip(phis).foreach { case (x, phi) =>
      val pred = model.predict(org.apache.spark.ml.linalg.Vectors.dense(x))
      approx(phi.sum + base, pred, 1e-8)
    }
    // per-tree: fast == brute on the first few instances
    val trees = model.trees.map(t => TreeShap.fromMllib(t.rootNode, feats))
    trees.foreach { t =>
      sample.take(5).foreach { x =>
        val fast = TreeShap.shapValues(t, x, 3)
        val brute = TreeShap.bruteForceShap(t, x, 3)
        fast.indices.foreach(i => approx(fast(i), brute(i), 1e-8))
      }
    }
  }

  test("fuzz: 60 random trees, fast path == brute force + additivity") {
    val rnd = new scala.util.Random(20260813L)
    val nFeat = 4
    def randTree(maxDepth: Int): ShapTree = {
      val feat = scala.collection.mutable.ArrayBuffer[Int]()
      val thr = scala.collection.mutable.ArrayBuffer[Double]()
      val lft = scala.collection.mutable.ArrayBuffer[Int]()
      val rgt = scala.collection.mutable.ArrayBuffer[Int]()
      val value = scala.collection.mutable.ArrayBuffer[Double]()
      def go(depth: Int): Int = {
        val id = feat.length
        feat += -1; thr += 0.0; lft += -1; rgt += -1
        value += rnd.nextDouble() * 10 - 5
        if (depth < maxDepth && rnd.nextDouble() < 0.75) {
          feat(id) = rnd.nextInt(nFeat)       // features may repeat on a path
          thr(id) = rnd.nextDouble() * 2 - 1
          lft(id) = go(depth + 1); rgt(id) = go(depth + 1)
        }
        id
      }
      go(0)
      val t0 = ShapTree(feat.toArray, thr.toArray, lft.toArray, rgt.toArray,
        value.toArray, new Array[Double](feat.length))
      // covers from routing a random background (zero-cover branches
      // occur naturally and must stay NaN-free)
      val bg = Array.fill(40)(Array.fill(nFeat)(rnd.nextDouble() * 2 - 1))
      val cover = new Array[Double](feat.length)
      bg.foreach { x =>
        var i = 0
        cover(i) += 1
        while (t0.feature(i) >= 0) {
          i = if (x(t0.feature(i)) <= t0.threshold(i)) t0.left(i) else t0.right(i)
          cover(i) += 1
        }
      }
      t0.copy(cover = cover)
    }
    (1 to 60).foreach { _ =>
      val t = randTree(4)
      (1 to 3).foreach { _ =>
        val x = Array.fill(nFeat)(rnd.nextDouble() * 2 - 1)
        val fast = TreeShap.shapValues(t, x, nFeat)
        val brute = TreeShap.bruteForceShap(t, x, nFeat)
        fast.indices.foreach { i =>
          assert(!fast(i).isNaN)
          approx(fast(i), brute(i), 1e-8)
        }
        approx(fast.sum, t.predict(x) - t.expectedValue, 1e-8)
      }
    }
  }

  test("fromMllib rejects categorical splits loudly, never misattributes") {
    // a future MLlib change that routed CategoricalSplit through the
    // continuous arm would silently produce wrong attributions; the
    // pinned error message keeps the guard observable
    import org.apache.spark.ml.attribute.{Attribute, AttributeGroup, NominalAttribute}
    import org.apache.spark.ml.linalg.Vectors
    import org.apache.spark.ml.regression.DecisionTreeRegressor
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // label pattern {1}→5, {0,2}→1 forces a category-set split
    val df = Seq(
      (Vectors.dense(0.0), 1.0), (Vectors.dense(0.0), 1.0),
      (Vectors.dense(1.0), 5.0), (Vectors.dense(1.0), 5.0),
      (Vectors.dense(2.0), 1.0), (Vectors.dense(2.0), 1.0))
      .toDF("features", "label")
    val meta = new AttributeGroup("features", Array[Attribute](
      NominalAttribute.defaultAttr.withName("c").withNumValues(3))).toMetadata()
    val tagged = df.select(col("features").as("features", meta), col("label"))
    val model = new DecisionTreeRegressor().setMaxDepth(2).setSeed(1).fit(tagged)
    assert(model.rootNode.isInstanceOf[org.apache.spark.ml.tree.InternalNode],
      "fixture must actually split")
    val ex = intercept[IllegalArgumentException] {
      TreeShap.fromMllib(model.rootNode,
        Array(Array(0.0), Array(1.0), Array(2.0)))
    }
    assert(ex.getMessage.contains("continuous splits only"), ex.getMessage)
  }

  test("q_shap_rf emits one ranked row per feature") {
    val out = graft.queries.MlPack.qShapRf(spark, TestSpark.sf).collect()
    assert(out.length == 8)
    val scores = out.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(scores.forall(v => v >= 0 && !v.isNaN))
  }
}
