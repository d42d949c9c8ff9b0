package graft.ml

import org.apache.spark.ml.regression.{DecisionTreeRegressionModel, RandomForestRegressionModel}
import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}

/** M10 TreeSHAP: exact per-instance Shapley attributions for tree
  * ensembles (`feature_selection_numerai.py:271-288` delegates to
  * `shap.TreeExplainer(model, data=train_x[:1000])`). This is the
  * polynomial-time path-attribution algorithm of Lundberg, Erion & Lee,
  * "Consistent Individualized Feature Attribution for Tree Ensembles"
  * (2018), Algorithm 2, implemented from the paper against MLlib's
  * public `Node`/`InternalNode`/`ContinuousSplit` tree API.
  *
  * Node cover (the per-node weighting that defines the conditional
  * expectations) is estimated by routing a caller-supplied background
  * sample through each tree — the same background-sample convention as
  * the reference's `data=train_x[:1000]` call. Additivity holds by
  * construction: Σ_j φ_j(x) = f(x) − E_background[f] per tree, hence
  * also for the forest average ([[TreeShapSpec]] pins it, plus equality
  * with a brute-force subset-enumeration Shapley on small trees).
  *
  * Scope mirrors the reference exactly: the explainer runs driver-side
  * over a bounded sample (the reference's own 1000-row cap); the
  * distributed parts are the model fit and the sample selection.
  */
object TreeShap {

  /** Array-form regression tree: `feature(i) == -1` marks a leaf with
    * prediction `value(i)`; internal nodes route left on
    * `x(feature) <= threshold`. `cover(i)` is the background-sample
    * count reaching node i. */
  final case class ShapTree(feature: Array[Int], threshold: Array[Double],
                            left: Array[Int], right: Array[Int],
                            value: Array[Double], cover: Array[Double]) {
    def predict(x: Array[Double]): Double = {
      var i = 0
      while (feature(i) >= 0)
        i = if (x(feature(i)) <= threshold(i)) left(i) else right(i)
      value(i)
    }

    /** Cover-weighted tree expectation E_background[f]. */
    def expectedValue: Double = {
      def go(i: Int): Double =
        if (feature(i) < 0) value(i)
        else if (cover(i) == 0) 0.0
        else (cover(left(i)) * go(left(i)) + cover(right(i)) * go(right(i))) / cover(i)
      go(0)
    }
  }

  /** Flatten an MLlib regression tree and fill covers by routing the
    * background rows. Continuous splits only (the engine's feature
    * frames are all-numeric; MLlib would need categorical metadata on
    * the input column to emit a CategoricalSplit). */
  def fromMllib(root: Node, background: Array[Array[Double]]): ShapTree = {
    val feat = scala.collection.mutable.ArrayBuffer[Int]()
    val thr = scala.collection.mutable.ArrayBuffer[Double]()
    val lft = scala.collection.mutable.ArrayBuffer[Int]()
    val rgt = scala.collection.mutable.ArrayBuffer[Int]()
    val value = scala.collection.mutable.ArrayBuffer[Double]()
    def go(n: Node): Int = {
      val id = feat.length
      feat += -1; thr += 0.0; lft += -1; rgt += -1; value += n.prediction
      n match {
        case in: InternalNode =>
          val cs = in.split match {
            case c: ContinuousSplit => c
            case other => throw new IllegalArgumentException(
              s"TreeShap supports continuous splits only, got $other")
          }
          feat(id) = cs.featureIndex; thr(id) = cs.threshold
          lft(id) = go(in.leftChild); rgt(id) = go(in.rightChild)
        case _: LeafNode => ()
      }
      id
    }
    go(root)
    val cover = new Array[Double](feat.length)
    background.foreach { x =>
      var i = 0
      cover(i) += 1
      while (feat(i) >= 0) {
        i = if (x(feat(i)) <= thr(i)) lft(i) else rgt(i)
        cover(i) += 1
      }
    }
    ShapTree(feat.toArray, thr.toArray, lft.toArray, rgt.toArray,
      value.toArray, cover)
  }

  /** One element of the feature path m: the feature it entered with,
    * its zero/one covering fractions, and the permutation-weight
    * polynomial coefficient. */
  private final case class PathElem(d: Int, z: Double, o: Double, var w: Double)

  /** EXTEND (paper Alg. 2): grow the path with a new (d, z, o) element,
    * updating the fraction-of-permutations weights. */
  private def extend(m: Vector[PathElem], pz: Double, po: Double, pi: Int): Array[PathElem] = {
    val l = m.length
    val arr = new Array[PathElem](l + 1)
    var i = 0
    while (i < l) { arr(i) = m(i).copy(); i += 1 }
    arr(l) = PathElem(pi, pz, po, if (l == 0) 1.0 else 0.0)
    i = l - 1
    while (i >= 0) {
      arr(i + 1).w += po * arr(i).w * (i + 1).toDouble / (l + 1)
      arr(i).w = pz * arr(i).w * (l - i).toDouble / (l + 1)
      i -= 1
    }
    arr
  }

  /** UNWIND (paper Alg. 2): undo an [[extend]] for the element at
    * `i0`, returning the shortened path. */
  private def unwind(m: Vector[PathElem], i0: Int): Vector[PathElem] = {
    val l = m.length - 1
    val o = m(i0).o
    val z = m(i0).z
    val arr = m.map(_.copy()).toArray
    var n = arr(l).w
    var j = l - 1
    while (j >= 0) {
      if (o != 0) {
        val t = arr(j).w
        arr(j).w = n * (l + 1) / ((j + 1) * o)
        n = t - arr(j).w * z * (l - j).toDouble / (l + 1)
      } else {
        arr(j).w = arr(j).w * (l + 1) / (z * (l - j))
      }
      j -= 1
    }
    var k = i0
    while (k < l) {
      arr(k) = PathElem(arr(k + 1).d, arr(k + 1).z, arr(k + 1).o, arr(k).w)
      k += 1
    }
    arr.take(l).toVector
  }

  /** Σ of the weights [[unwind]] would produce for element `i0`,
    * without materializing the unwound path. */
  private def unwoundSum(m: Vector[PathElem], i0: Int): Double = {
    val l = m.length - 1
    val o = m(i0).o
    val z = m(i0).z
    var n = m(l).w
    var total = 0.0
    var j = l - 1
    while (j >= 0) {
      if (o != 0) {
        val t = n * (l + 1) / ((j + 1) * o)
        total += t
        n = m(j).w - t * z * (l - j).toDouble / (l + 1)
      } else {
        total += m(j).w * (l + 1) / (z * (l - j))
      }
      j -= 1
    }
    total
  }

  /** Exact SHAP values for one instance under one tree. Returns the
    * length-`nFeatures` attribution vector; `phi.sum == f(x) −
    * expectedValue` up to float error. */
  def shapValues(tree: ShapTree, x: Array[Double], nFeatures: Int): Array[Double] = {
    val phi = new Array[Double](nFeatures)
    def recurse(j: Int, m0: Vector[PathElem], pz: Double, po: Double, pi: Int): Unit = {
      val m = extend(m0, pz, po, pi).toVector
      if (tree.feature(j) < 0) {
        var i = 1
        while (i < m.length) {
          phi(m(i).d) += unwoundSum(m, i) * (m(i).o - m(i).z) * tree.value(j)
          i += 1
        }
      } else {
        val d = tree.feature(j)
        val (hot, cold) =
          if (x(d) <= tree.threshold(j)) (tree.left(j), tree.right(j))
          else (tree.right(j), tree.left(j))
        def frac(child: Int): Double =
          if (tree.cover(j) == 0) 0.0 else tree.cover(child) / tree.cover(j)
        var iz = 1.0
        var io = 1.0
        var m1 = m
        val k = m.indexWhere(_.d == d, 1)
        if (k >= 1) { iz = m(k).z; io = m(k).o; m1 = unwind(m, k) }
        // a branch with both fractions 0 contributes nothing (and its
        // zero-cover elements would poison UNWIND with 0/0)
        if (iz * frac(hot) != 0 || io != 0)
          recurse(hot, m1, iz * frac(hot), io, d)
        if (iz * frac(cold) != 0)
          recurse(cold, m1, iz * frac(cold), 0.0, d)
      }
    }
    recurse(0, Vector.empty, 1.0, 1.0, -1)
    phi
  }

  /** Forest-level SHAP: MLlib regression forests predict the MEAN of
    * tree predictions, so attributions and base value average too.
    * Returns (per-row phi matrix, expected value). */
  def forestShap(model: RandomForestRegressionModel, rows: Array[Array[Double]],
                 background: Array[Array[Double]], nFeatures: Int): (Array[Array[Double]], Double) = {
    val trees = model.trees.map(t => fromMllib(t.rootNode, background))
    val nt = trees.length.toDouble
    val base = trees.map(_.expectedValue).sum / nt
    val phis = rows.map { x =>
      val acc = new Array[Double](nFeatures)
      trees.foreach { t =>
        val p = shapValues(t, x, nFeatures)
        var i = 0
        while (i < nFeatures) { acc(i) += p(i) / nt; i += 1 }
      }
      acc
    }
    (phis, base)
  }

  /** Brute-force Shapley by subset enumeration over Algorithm 1's
    * cover-weighted conditional expectation — exponential in the
    * feature count, used by [[graft.TreeShapSpec]] as the ground truth
    * the fast path must reproduce. */
  def bruteForceShap(tree: ShapTree, x: Array[Double], nFeatures: Int): Array[Double] = {
    def expvalue(sub: Set[Int]): Double = {
      def go(i: Int): Double =
        if (tree.feature(i) < 0) tree.value(i)
        else if (sub.contains(tree.feature(i)))
          go(if (x(tree.feature(i)) <= tree.threshold(i)) tree.left(i) else tree.right(i))
        else if (tree.cover(i) == 0) 0.0
        else (tree.cover(tree.left(i)) * go(tree.left(i))
          + tree.cover(tree.right(i)) * go(tree.right(i))) / tree.cover(i)
      go(0)
    }
    def fact(n: Int): Double = (1 to n).foldLeft(1.0)(_ * _)
    val all = (0 until nFeatures).toSet
    Array.tabulate(nFeatures) { i =>
      all.excl(i).subsets().map { s =>
        val w = fact(s.size) * fact(nFeatures - s.size - 1) / fact(nFeatures)
        w * (expvalue(s + i) - expvalue(s))
      }.sum
    }
  }
}
