package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilarityPack

/** Bucketed kNN self-join: the DuckDB oracle pins exact values; these
  * pin the semantics that make the values useful — every vector gets
  * its k ranked rows, reported cosines are the true cosines, and the
  * bucketed approximation recovers most of the exact kNN graph. */
class KnnJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val rows = SimilarityPack.qKnnJoin(spark, TestSpark.sf)
    .as[(Long, Long, Double, Long)].collect()

  private lazy val exact: Map[Long, Seq[Long]] = {
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .withColumn("nrm", sqrt(graft.functions.DotProduct
        .dot_product(col("v"), col("v"))))
    val q = e.select(col("vec_id").as("q_id"), col("v").as("qv"),
      col("nrm").as("qn"))
    q.crossJoin(e)
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("cos", round(graft.functions.DotProduct
        .dot_product(col("qv"), col("v")) / (col("qn") * col("nrm")), 6))
      .withColumn("rank", row_number().over(Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("vec_id"))
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).map { case (q, ns) => (q, ns.map(_._2)) }
  }

  test("every vector gets exactly 3 ranked neighbors; no self matches") {
    val n = Tables.embeddings(spark, TestSpark.sf).count()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == n, s"${byQ.size} queried vectors, corpus has $n")
    byQ.foreach { case (q, rs) =>
      assert(rs.length == 3 && rs.map(_._4).sorted.sameElements(Seq(1L, 2L, 3L)),
        s"vector $q ranks")
      assert(rs.forall(_._2 != q), s"vector $q self-match")
    }
  }

  test("reported cosines are the true cosines of the reported pairs") {
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => (id, v.toArray) }.toMap
    rows.foreach { case (q, nId, cos, _) =>
      val (a, b) = (e(q), e(nId))
      var dp = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val want = BigDecimal(dp / math.sqrt(na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(cos - want) < 1e-9, s"cos($q, $nId): $cos vs $want")
    }
  }

  test("relational flat path and index-kernel path emit identical rows") {
    // the batch query plans the pure-Catalyst flat form at fixture k;
    // ScaleProbe's blow-ups take the two-level index + probe kernel.
    // Same arithmetic (index-order sums) ⇒ bit-equal output — this is
    // what licenses measuring the scale path as "the same operator"
    val kernel = SimilarityPack.knnJoin(spark, TestSpark.sf,
        requireK = Some(16), forceKernel = true)
      .as[(Long, Long, Double, Long)].collect()
    assert(kernel.sameElements(rows),
      "kernel path diverged from the relational flat path")
  }

  test("bucketed kNN recovers most of the exact kNN graph (recall@3)") {
    // the fixture's near-uniform random vectors are the ANN
    // worst case (true neighbors spread across cells); measured
    // recall at nprobe 4/6/8 is 0.48/0.63/0.74, and the query ships
    // nprobe=8 — real clustered embeddings sit far above this floor
    val hits = rows.count { case (q, nId, _, _) =>
      exact.get(q).exists(_.contains(nId)) }
    val recall = hits.toDouble / rows.length
    assert(recall >= 0.65, f"recall@3 vs exact kNN too low: $recall%.3f")
  }
}
