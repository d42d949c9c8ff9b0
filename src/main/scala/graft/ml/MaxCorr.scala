package graft.ml

/** A12 — maximal correlation via ACE (alternating conditional
  * expectations), the `distance_func.py:26-35` distance. Driver-side
  * on a collected column pair by design (SURVEY A12: 310 features →
  * pairs are two columns; the distributed part is sampling/collecting
  * the pair, not the smoother).
  *
  * Discretized ACE: iterate conditional-mean smoothing of the
  * standardized transforms against equal-width bins until the
  * correlation gain drops below tol. Returns the maximal correlation
  * in [0, 1]; `distance` = 1 - maxCorr.
  */
object MaxCorr {

  private def standardize(v: Array[Double]): Array[Double] = {
    val n = v.length
    val m = v.sum / n
    val sd = math.sqrt(v.map(x => (x - m) * (x - m)).sum / n)
    if (sd == 0) Array.fill(n)(0.0) else v.map(x => (x - m) / sd)
  }

  private def binsOf(v: Array[Double], nBins: Int): Array[Int] = {
    val lo = v.min; val hi = v.max
    if (hi == lo) Array.fill(v.length)(0)
    else v.map(x => math.min(nBins - 1, ((x - lo) / (hi - lo) * nBins).toInt))
  }

  /** Conditional mean of `target` within each bin of `by`. */
  private def smooth(target: Array[Double], by: Array[Int]): Array[Double] = {
    val sums = new java.util.HashMap[Int, (Double, Int)]()
    by.indices.foreach { i =>
      val (s, c) = Option(sums.get(by(i))).getOrElse((0.0, 0))
      sums.put(by(i), (s + target(i), c + 1))
    }
    by.map { b => val (s, c) = sums.get(b); s / c }
  }

  private def corrOf(a: Array[Double], b: Array[Double]): Double = {
    val n = a.length
    val ma = a.sum / n; val mb = b.sum / n
    val cov = a.indices.map(i => (a(i) - ma) * (b(i) - mb)).sum
    val va = a.map(x => (x - ma) * (x - ma)).sum
    val vb = b.map(x => (x - mb) * (x - mb)).sum
    if (va == 0 || vb == 0) 0.0 else cov / math.sqrt(va * vb)
  }

  def maxCorrelation(x: Array[Double], y: Array[Double], nBins: Int = 10,
                     maxIter: Int = 50, tol: Double = 1e-6): Double = {
    require(x.length == y.length && x.nonEmpty)
    val bx = binsOf(x, nBins)
    val by = binsOf(y, nBins)
    var theta = standardize(y)
    var phi = standardize(x)
    var last = 0.0
    var iter = 0
    var gain = Double.MaxValue
    while (iter < maxIter && gain > tol) {
      phi = standardize(smooth(theta, bx))   // E[theta(y) | x]
      theta = standardize(smooth(phi, by))   // E[phi(x) | y]
      // signed, matching the reference's convention (distance_func
      // .py:34 uses 1 - corr, not 1 - |corr|): a negatively-correlated
      // transform pair yields a distance > 1 there too
      val c = corrOf(phi, theta)
      gain = math.abs(c - last)
      last = c
      iter += 1
    }
    last
  }

  /** The reference's distance: 1 - maxCorr (`distance_func.py:34`). */
  def maxCorrDistance(x: Array[Double], y: Array[Double]): Double =
    1.0 - maxCorrelation(x, y)
}
