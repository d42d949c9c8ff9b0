package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EraRank

/** The W1 scale mitigation (SCALE.md "Windows"): two-pass era-rank via
  * sketch-bucketed offsets + (era, bucket) windows must be
  * ROW-IDENTICAL to the one-pass `Window.partitionBy(era)` form — the
  * whole point is a bit-equal answer with bounded window partitions —
  * and its row_number window must never partition on the era alone.
  */
class EraRankTwoPassSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Adversarial fixture: heavy pred ties (3 distinct values across 60
    * rows per era), a null-pred row, an all-null era, a 1-row era. */
  private def fixture = {
    val dense = for (e <- 1 to 3; i <- 1 to 60)
      yield (e.toLong, (e * 100 + i).toLong, Some((i % 3).toDouble))
    val nulls = Seq((1L, 990L, None), (4L, 991L, None), (4L, 992L, None))
    val single = Seq((5L, 995L, Some(42.0)))
    (dense ++ nulls ++ single).toDF("era", "id", "pred")
  }

  test("two-pass rank is row-identical to one-pass on ties/nulls/tiny eras") {
    val df = fixture
    val one = EraRank.withPctRankFirst(df, "r", col("era"), col("pred"), col("id"))
      .select(col("id"), col("r"))
    val two = EraRank.withPctRankFirstTwoPass(df, "r", 8, col("era"),
        col("pred"), col("id"))
      .select(col("id"), col("r"))
    assert(one.except(two).count() == 0 && two.except(one).count() == 0)
    assert(two.count() == df.count()) // no row dropped at the bucket join
  }

  test("two-pass rank matches with buckets coarser than distinct values") {
    // only 3 distinct pred values vs 16 buckets: most edge slots repeat,
    // ties MUST co-bucket for correctness
    val df = fixture
    val one = EraRank.withPctRankFirst(df, "r", col("era"), col("pred"), col("id"))
      .select(col("id"), col("r"))
    val two = EraRank.withPctRankFirstTwoPass(df, "r", 16, col("era"),
        col("pred"), col("id"))
      .select(col("id"), col("r"))
    assert(one.except(two).count() == 0 && two.except(one).count() == 0)
  }

  test("spearmanByEraTwoPass equals spearmanByEra on real fixture shape") {
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select(Tables.eraOfDate(col("l_shipdate")).as("era"),
        col("l_extendedprice").as("pred"), col("l_quantity").as("y"),
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    val a = EraRank.spearmanByEra(li, col("era"), col("pred"), col("y"),
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      .as[Double].head()
    val b = EraRank.spearmanByEraTwoPass(li, col("era"), col("pred"), col("y"),
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      .as[Double].head()
    assert(a == b)
  }

  test("no row_number window partitions on the era alone") {
    val df = fixture
    val two = EraRank.withPctRankFirstTwoPass(df, "r", 8, col("era"),
      col("pred"), col("id"))
    two.collect() // finalize any adaptive plan
    // manual walk: AQE hides the finalized tree behind AdaptiveSparkPlanExec
    // .executedPlan and QueryStageExec.plan, which SparkPlan.collect's
    // children-based traversal does not enter
    def leaves(p: org.apache.spark.sql.execution.SparkPlan): Seq[WindowExec] = {
      val self = p match { case w: WindowExec => Seq(w); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self ++ kids.flatMap(leaves)
    }
    val wins = leaves(two.queryExecution.executedPlan)
    assert(wins.nonEmpty)
    val rowNumWins = wins.filter(_.windowExpression.exists(
      _.toString.contains("row_number")))
    assert(rowNumWins.nonEmpty)
    // the fact-side row_number window must fan out on (era, bucket)
    rowNumWins.foreach { w =>
      assert(w.partitionSpec.size >= 2,
        s"row_number window spans a whole era: ${w.partitionSpec}")
    }
  }

  test("bucketing actually splits large eras across window partitions") {
    // uniform preds so the sketch edges spread: no (era,bucket) group may
    // hold a whole era
    val df = (1 to 2000).map(i => ((i % 2).toLong, i.toLong, i.toDouble))
      .toDF("era", "id", "pred")
    val ranked = EraRank.withPctRankFirstTwoPass(df, "r", 8, col("era"),
      col("pred"), col("id"))
    val one = EraRank.withPctRankFirst(df, "r", col("era"), col("pred"), col("id"))
      .select(col("id"), col("r"))
    assert(one.except(ranked.select(col("id"), col("r"))).count() == 0)
    // reconstruct the bucket groups the operator used (same ~10%
    // value-hash sample feeding the sketch)
    val edges = df.filter(pmod(xxhash64(col("pred")), lit(10)) === 0)
      .groupBy(col("era")).agg(
      percentile_approx(col("pred"), array((1 until 8).map(i => lit(i / 8.0)): _*),
        lit(100)).as("edges"))
    val maxGroup = df.join(broadcast(edges), "era")
      .withColumn("bkt", size(filter(col("edges"), e => e < col("pred"))))
      .groupBy(col("era"), col("bkt")).count()
      .agg(max("count")).as[Long].head()
    assert(maxGroup <= 1000 / 4, s"bucket groups too coarse: $maxGroup")
  }

  test("managed pair's cleanup unpersists the shared base; answers survive it") {
    // the pair form persists its bucketed base (four consumers); the
    // managed variant must release that cache entry on cleanup, and a
    // post-cleanup re-materialization must still agree (bucketing is a
    // pure function of values + frozen literals, so the recompute path
    // is consistent by construction)
    val df = fixture
    val before = spark.sparkContext.getPersistentRDDs.size
    val (ra, rb, cleanup) = EraRank.withRowNumberTwoPassPairManaged(
      df, "rn", 4, col("era"),
      col("id"), Seq.empty, col("pred"), Seq(col("id")))
    val gotA = ra.orderBy(col("era"), col("id")).collect().toSeq
    val gotB = rb.orderBy(col("era"), col("id")).collect().toSeq
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "pair form should have persisted its shared base")
    cleanup()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "cleanup must unpersist the shared base")
    assert(ra.orderBy(col("era"), col("id")).collect().toSeq == gotA)
    assert(rb.orderBy(col("era"), col("id")).collect().toSeq == gotB)
  }
}
