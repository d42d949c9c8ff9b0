package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

/** Connected components must compute exact component minima on
  * adversarial shapes (chains that need multiple contraction rounds,
  * merges through a late edge, parallel components) on BOTH paths —
  * the KB-bounded driver union-find and the distributed
  * large-star/small-star contraction — and the distributed path must
  * refuse to return a partial closure when capped below convergence.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], maxIter: Int = 20,
                  smallMax: Long = 65536L): Map[Long, Long] =
    ConnectedComponents.labels(edges.toDF("a", "b"), maxIter, smallMax)
      .as[(Long, Long)].collect().toMap

  /** same input through the driver union-find AND the distributed
    * contraction — the two paths must agree exactly */
  private def runBoth(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val small = run(edges)
    val dist = run(edges, smallMax = 0L)
    assert(small == dist, "driver union-find diverged from star contraction")
    small
  }

  test("chain, triangle, and disjoint components resolve to their minima") {
    // chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
    val got = runBoth(Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("late bridge merges two components; matches brute-force BFS") {
    val edges = Seq((1L, 5L), (5L, 9L), (2L, 6L), (6L, 9L), (3L, 7L),
      (100L, 101L), (4L, 8L), (8L, 7L), (9L, 7L))
    val got = runBoth(edges)
    // brute force: repeated relaxation over the symmetric edge list
    val sym = edges ++ edges.map(_.swap)
    val nodes = sym.map(_._1).distinct
    var lab = nodes.map(v => v -> v).toMap
    var changed = true
    while (changed) {
      changed = false
      for ((v, u) <- sym) if (lab(u) < lab(v)) { lab += v -> lab(u); changed = true }
    }
    assert(got == lab)
  }

  test("empty edge list yields an empty labelling") {
    assert(run(Seq.empty).isEmpty)
    assert(run(Seq.empty, smallMax = 0L).isEmpty)
  }

  test("self-loop-only nodes label as singletons on both paths") {
    // node 7's only edge is (7,7); node 2 has a self-loop AND a real
    // edge — the singleton fill-in must not double-label it
    val got = runBoth(Seq((7L, 7L), (2L, 2L), (1L, 2L)))
    assert(got == Map(7L -> 7L, 1L -> 1L, 2L -> 1L))
    // all-self-loop graph: no connectivity at all, every node its own rep
    assert(runBoth(Seq((3L, 3L), (4L, 4L))) == Map(3L -> 3L, 4L -> 4L))
  }

  test("diameter-21 path converges in logarithmic contraction rounds") {
    // 22-node path: min-label hooking would need 21 rounds; star
    // contraction must close it well inside maxIter = 8 (log-rounds
    // is the property that makes kNN-graph chains tractable)
    val path = (1L to 22L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = run(path, maxIter = 8, smallMax = 0L)
    assert(got == (1L to 22L).map(_ -> 1L).toMap)
  }

  test("distributed path refuses a partial closure when capped below convergence") {
    val chain = (1L to 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    intercept[IllegalStateException] { run(chain, maxIter = 1, smallMax = 0L) }
  }
}
