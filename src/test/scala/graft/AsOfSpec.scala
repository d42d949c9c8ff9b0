package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf
import graft.plans.AsOfMerge

/** As-of join: hand-checked semantics + equality of the window
  * composition and the cogroup sort-merge implementation. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asOfJoin picks latest at-or-before, right wins ties, null before first") {
    val probe = Seq((1L, 5L, 100L), (1L, 15L, 101L), (1L, 25L, 102L), (2L, 9L, 103L))
      .toDF("k", "t", "id")
    val ref = Seq((1L, 10L, 200L), (1L, 20L, 201L), (1L, 25L, 202L))
      .toDF("k", "t", "id").withColumn("pay", col("id") - 193L)
    val got = AsOf.asOfJoin(probe, ref, "k", "t", "id", "pay")
      .select(col("id"), col("pay_asof")).orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq(
      (100L, None),        // t=5: before the first ref
      (101L, Some(7L)),    // t=15: ref at 10
      (102L, Some(9L)),    // t=25: ref at 25 ties -> right wins
      (103L, None)))       // key 2: no refs
  }

  test("custom AsOfJoinExec plan node equals the window composition") {
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("t"),
        col("event_id"), col("event_type"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("t"), col("event_id"),
        col("event_id").as("pay"))
    val viaWindow = graft.operators.AsOf
      .asOfJoin(ev, signups, "user_id", "t", "event_id", "pay")
      .select(col("event_id"), col("pay_asof"))
    val planned = graft.plans.AsOfApi
      .asOfJoinPlanned(ev, signups, "user_id", "t", "event_id", "pay")
    // the custom exec must actually be in the physical plan
    assert(planned.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val viaPlan = planned.select(col("event_id"), col("pay_asof"))
    assert(viaPlan.count() == viaWindow.count())
    assert(viaPlan.except(viaWindow).count() == 0)
    assert(viaWindow.except(viaPlan).count() == 0)
  }

  test("cogroup sort-merge equals the window composition on the fixture") {
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("unix_micros(ts)").as("t"),
        col("event_id"), col("event_type"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("t"), col("event_id"),
        col("event_id").as("pay"))
    val viaWindow = AsOf.asOfJoin(ev, signups, "user_id", "t", "event_id", "pay")
      .select(col("event_id"), col("pay_asof"))
    val viaMerge = AsOfMerge.asOfJoinMerge(
        ev.select("user_id", "t", "event_id"), signups, "user_id", "t", "event_id", "pay")
      .select(col("event_id"), col("pay_asof"))
    assert(viaWindow.count() == viaMerge.count())
    assert(viaWindow.except(viaMerge).count() == 0)
    assert(viaMerge.except(viaWindow).count() == 0)
  }
}
