package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

/** Write-side bucketing kills the join shuffle; the custom optimizer
  * rule restores scan pushdown through the custom as-of node. */
class BucketRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed fact-fact join plans with no shuffle exchange") {
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_totalprice")
    // the in-memory catalog forgets tables between sessions but leaves
    // their warehouse dirs behind; clear both before re-creating
    Seq("graft_li_b", "graft_o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(li, "graft_li_b", "l_orderkey", 4)
    Bucketing.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "graft_o_b", "l_orderkey", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_li_b")
        .join(spark.table("graft_o_b"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange"), plan.take(800))
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed Q18 (heaviest repeated fact-fact path) runs shuffle-free end to end") {
    // SCALE.md's 100 TB claim for the star battery: with orders and
    // lineitem bucketed on the order key, the ENTIRE Q18 pipeline —
    // the HAVING aggregate on lineitem, the semi join, the
    // orders⋈lineitem join, and the final group-by (whose keys are a
    // superset of the bucket key) — plans with zero shuffle
    // exchanges; the only exchange left is the broadcast of the
    // customer dim, and the top-100 is a TakeOrderedAndProject, not a
    // range-partitioned sort
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, TestSpark.sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Seq("graft_q18_li", "graft_q18_o").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Bucketing.writeBucketed(li, "graft_q18_li", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "graft_q18_o", "o_orderkey", 4)
    val cust = Tables.customer(spark, TestSpark.sf).select("c_custkey", "c_name")
    // a floor low enough that the sf0.001 fixture keeps rows flowing
    // through every stage (the canonical 150 floor empties it)
    val floor = 60L
    def q18(ordersDf: org.apache.spark.sql.DataFrame,
            liDf: org.apache.spark.sql.DataFrame) = {
      val big = liDf.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("long")).as("tot"))
        .filter(col("tot") > floor).select(col("l_orderkey").as("big_ok"))
      ordersDf.join(big, col("o_orderkey") === col("big_ok"), "left_semi")
        .join(liDf, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"), col("o_orderkey"), col("o_totalprice"))
        .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }
    val bucketed = q18(spark.table("graft_q18_o"), spark.table("graft_q18_li"))
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
    assert(!plan.contains("Exchange rangepartitioning"), plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    // and the shuffle-free plan computes exactly what the plain one does
    val expect = q18(o, li).collect().toSeq
    val got = bucketed.collect().toSeq
    assert(got.nonEmpty && got == expect,
      s"bucketed=${got.take(3)} plain=${expect.take(3)}")
  }

  test("custom rule pushes probe-side filters through AsOfJoinNode into the scan") {
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("t"),
        col("event_id"), col("event_type"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("t"), col("event_id"),
        col("event_id").as("pay"))
    val planned = graft.plans.AsOfApi
      .asOfJoinPlanned(ev, signups, "user_id", "t", "event_id", "pay")
      .filter(col("event_type") === "click")
    val phys = planned.queryExecution.executedPlan.toString
    // the filter must reach the left parquet scan, not sit above the join
    assert(phys.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]")
      || phys.contains("EqualTo(event_type,click)"), phys.take(1200))
    // and the results match the composition filtered the same way
    val expect = graft.operators.AsOf
      .asOfJoin(ev, signups, "user_id", "t", "event_id", "pay")
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("pay_asof"))
    val got = planned.select(col("event_id"), col("pay_asof"))
    assert(got.except(expect).count() == 0 && expect.except(got).count() == 0)
  }
}
