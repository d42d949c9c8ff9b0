package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilarityPack

/** q_knn_triangles must equal a brute-force triangle count over the
  * SAME mutual edge relation, and its clustering coefficients must be
  * the exact 2T/(deg(deg−1)) ratios — verified by independent Scala
  * replay, not by re-running the wedge join. */
class KnnTriangleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val edges: Set[(Long, Long)] =
    SimilarityPack.mutualKnnEdges(spark, TestSpark.sf, requireK = None)
      .as[(Long, Long)].collect().toSet

  private lazy val got: Seq[(Long, Long, Long, Double)] =
    SimilarityPack.knnTriangles(spark, TestSpark.sf, requireK = None)
      .as[(Long, Long, Long, Double)].collect().toSeq

  test("per-node triangle counts match the brute-force enumeration") {
    // brute force: all node triples restricted to the (small) mutual
    // graph's adjacency — O(n_nodes^3) on a few hundred nodes
    val adj = edges.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (v, es) => (v, es.map(_._2)) }
    val nodes = adj.keys.toSeq.sorted
    val triOf = scala.collection.mutable.HashMap.empty[Long, Long]
      .withDefaultValue(0L)
    var total = 0L
    for {
      x <- nodes; y <- adj(x) if y > x; z <- adj(y) if z > y
      if adj(x).contains(z)
    } {
      total += 1
      triOf(x) += 1; triOf(y) += 1; triOf(z) += 1
    }
    assert(got.map(_._1) == nodes, "one output row per graph node, sorted")
    got.foreach { case (id, _, nTri, _) =>
      assert(nTri == triOf(id), s"n_tri($id)")
    }
    // each triangle contributes to exactly three nodes
    assert(got.map(_._3).sum == 3 * total)
  }

  test("degree and clustering are the exact ratios of the brute-force graph") {
    val degOf = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (v, vs) => (v, vs.size.toLong) }
    got.foreach { case (id, deg, nTri, c) =>
      assert(deg == degOf(id), s"deg($id)")
      val want =
        if (deg < 2) 0.0
        else BigDecimal(2.0 * nTri / (deg * (deg - 1)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(c == want, s"clustering($id): $c vs $want")
      assert(c >= 0.0 && c <= 1.0, s"clustering($id) out of [0,1]")
    }
  }

  test("every triangle edge is a mutual edge (wedge join closed correctly)") {
    // reconstruct the triangle set the counts imply is non-empty only
    // if its closing edges exist; spot-check by re-deriving triangles
    // from the edge set and confirming the operator found at least
    // one IFF the graph has one
    val adj = edges.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (v, es) => (v, es.map(_._2)) }
    val hasTriangle = edges.exists { case (a, b) =>
      adj(a).exists(z => z != b && adj(b).contains(z))
    }
    assert((got.map(_._3).sum > 0) == hasTriangle)
  }
}
