package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.SimilarityPack

/** MMR-diversified retrieval: greedy-selection invariants on the
  * fixture (the DuckDB oracle already pins exact selection). */
class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val mmr = SimilarityPack.qAnnMmr(spark, TestSpark.sf)
    .as[(Long, Long, Long, Double, Double)].collect()
    .groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap

  private lazy val top5 = SimilarityPack.qAnnCosine(spark, TestSpark.sf)
    .select(col("q_id"), col("n_id")).as[(Long, Long)].collect()
    .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("5 distinct picks per query; rank 1 is the plain cosine argmax") {
    assert(mmr.nonEmpty)
    mmr.foreach { case (q, rows) =>
      assert(rows.length == 5 && rows.map(_._2).distinct.length == 5)
      // the greedy start: max 7*cos_u on the integer grid, n_id
      // tie-break. 7*cos_u is STRICTLY monotone in cos_u (unlike the
      // r15 round(0.7*cos, 6), which compressed 1e-6-distinct cosines
      // into ties), so this is now a true invariant: the pick equals
      // qAnnCosine's rank-1 row exactly
      val plainFirst = SimilarityPack.qAnnCosine(spark, TestSpark.sf)
        .filter(col("q_id") === q && col("rank") === 1)
        .select("n_id").as[Long].head()
      assert(rows.head._2 == plainFirst, s"query $q rank-1 diverges")
    }
  }

  test("winning MMR scores are non-increasing in rank") {
    // each step shrinks the pool and grows every candidate's penalty,
    // so the step-k+1 winner cannot beat the step-k winner
    mmr.foreach { case (q, rows) =>
      rows.sliding(2).foreach { w =>
        assert(w(0)._5 >= w(1)._5,
          s"query $q: rank ${w(1)._3} score ${w(1)._5} > rank ${w(0)._3}")
      }
    }
  }

  test("diversification is real: some query swaps a redundant top-5 neighbor") {
    val diversified = mmr.count { case (q, rows) =>
      rows.map(_._2).toSet != top5(q)
    }
    assert(diversified > 0,
      "MMR selected exactly the plain top-5 for every query — lambda inert")
  }

  test("RRF fusion: scores recompute from the ranks; both rankers contribute") {
    val rows = SimilarityPack.qRrfHybrid(spark, TestSpark.sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == 20)
    // rrf recomputes exactly from the emitted ranks (0 = unranked)
    rows.foreach { case (id, rl, rs, rrf) =>
      val want = BigDecimal(
        (if (rl > 0) 1.0 / (60.0 + rl) else 0.0) +
        (if (rs > 0) 1.0 / (60.0 + rs) else 0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rrf - want) < 1e-9, s"doc $id rrf $rrf != $want")
    }
    // descending fusion order, and the fused head draws on BOTH lists
    assert(rows.map(_._4).sliding(2).forall(w => w(0) >= w(1)))
    assert(rows.exists(r => r._2 > 0 && r._3 > 0),
      "no doc ranked by both lexical and semantic lists — fusion vacuous")
    assert(rows.head._2 > 0 && rows.head._3 > 0,
      "the top fused doc should be dual-listed at k=60")
  }
}
