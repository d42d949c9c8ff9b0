package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.MaxCorr

/** A12: ACE maximal correlation recovers nonlinear dependence that
  * Pearson misses. */
class MaxCorrSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("maxCorr ~ 1 for a deterministic nonlinear relation (y = x^2)") {
    val x = Array.fill(2000)(rnd.nextDouble() * 4 - 2)
    val y = x.map(v => v * v)
    // Pearson is ~0 on symmetric x^2 ...
    val n = x.length
    val mx = x.sum / n; val my = y.sum / n
    val pearson = x.indices.map(i => (x(i) - mx) * (y(i) - my)).sum /
      math.sqrt(x.map(v => (v - mx) * (v - mx)).sum * y.map(v => (v - my) * (v - my)).sum)
    assert(math.abs(pearson) < 0.15)
    // ... ACE finds the transform
    assert(MaxCorr.maxCorrelation(x, y) > 0.9)
  }

  test("maxCorr ~ 0 for independent noise, bounded in [0,1]") {
    val x = Array.fill(2000)(rnd.nextDouble())
    val y = Array.fill(2000)(rnd.nextDouble())
    val c = MaxCorr.maxCorrelation(x, y)
    assert(c >= 0.0 && c <= 1.0)
    assert(c < 0.3)
    assert(MaxCorr.maxCorrDistance(x, y) > 0.7)
  }

  test("maxCorr = 1 for a linear relation") {
    val x = (1 to 500).map(_.toDouble).toArray
    val y = x.map(_ * -3 + 7)
    assert(MaxCorr.maxCorrelation(x, y) > 0.99)
  }
}
