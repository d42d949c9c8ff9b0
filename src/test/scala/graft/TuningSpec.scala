package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Tuning
import graft.ml.Tuning.Param

/** M5/M6 driver-side search semantics (`utils.py:89-129`,
  * `tuners.py:376-509`). */
class TuningSpec extends AnyFunSuite {

  test("LHS: one sample per stratum per dimension, bounds respected") {
    val params = Seq(Param("a", 0, 10), Param("b", 1, 100, log = true))
    val n = 16
    val samples = Tuning.latinHypercube(params, n, seed = 42)
    assert(samples.size == n)
    for (p <- params) {
      val vs = samples.map(_(p.name))
      assert(vs.forall(v => v >= p.lo && v <= p.hi))
      // stratification: exactly one sample falls in each of the n strata
      val strata = vs.map { v =>
        val u = if (p.log) (math.log(v) - math.log(p.lo)) / (math.log(p.hi) - math.log(p.lo))
        else (v - p.lo) / (p.hi - p.lo)
        math.min(n - 1, (u * n).toInt)
      }
      assert(strata.toSet.size == n, s"param ${p.name}: strata $strata")
    }
  }

  test("LHS integer params quantize, determinism per seed") {
    val ps = Seq(Param("trees", 10, 1000, isInt = true))
    val s1 = Tuning.latinHypercube(ps, 8, 7)
    val s2 = Tuning.latinHypercube(ps, 8, 7)
    assert(s1 == s2)
    assert(s1.forall(m => m("trees") == math.rint(m("trees"))))
  }

  test("lhsSearch ranks by score descending") {
    val ps = Seq(Param("x", 0, 1))
    val trials = Tuning.lhsSearch(ps, 10, 3)(c => -math.abs(c("x") - 0.5))
    assert(trials.map(_.score) == trials.map(_.score).sorted.reverse)
    assert(math.abs(trials.head.config("x") - 0.5) < 0.2)
  }

  test("hyperbandBatch: identical trials to per-config hyperband") {
    val ps = Seq(Param("x", 0, 1))
    def sc(c: Map[String, Double], frac: Double) = -math.abs(c("x") - 0.3) * frac
    val single = Tuning.hyperband(ps, maxResource = 9, eta = 3, seed = 5)(sc)
    // brackets run concurrently (the documented callback contract), so
    // the accumulator must be thread-safe — a plain var here was a
    // data race with possible lost updates (ADVICE r17)
    val rungSizes = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val batch = Tuning.hyperbandBatch(ps, maxResource = 9, eta = 3, seed = 5) {
      (cs, frac) => rungSizes.add(cs.size); cs.map(sc(_, frac))
    }
    assert(batch == single)
    // whole rungs are evaluated at once (no one-config-at-a-time calls
    // except rungs that genuinely hold one survivor)
    assert({ import scala.jdk.CollectionConverters._
      rungSizes.asScala.exists(_ > 1) })
  }

  test("hyperband: converges toward the optimum, evaluates head-fractions") {
    val ps = Seq(Param("x", 0, 1))
    // concurrent-callback contract: accumulate through a thread-safe
    // collection, not a var (see the rung-size note above)
    val fracQ = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
    val trials = Tuning.hyperband(ps, maxResource = 9, eta = 3, seed = 1) {
      (c, frac) => fracQ.add(frac); -math.abs(c("x") - 0.7)
    }
    val fractions = { import scala.jdk.CollectionConverters._; fracQ.asScala.toSet }
    assert(trials.nonEmpty)
    assert(trials.map(_.score) == trials.map(_.score).sorted.reverse)
    assert(fractions.exists(_ < 1.0) && fractions.contains(1.0))
    assert(math.abs(trials.head.config("x") - 0.7) < 0.25)
  }
}
