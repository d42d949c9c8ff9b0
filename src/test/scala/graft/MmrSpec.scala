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
      // the greedy start: max rounded cos, n_id tie-break — which is
      // exactly qAnnCosine's rank-1 row
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
}
