package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The span-form gap-fill must reproduce the ignoreNulls-window
  * semantics the oracle encodes for NULL-valued observation hours —
  * the r13 review caught the first span form pairing spans with
  * null-`v` hours as anchors. Reference = the original two-window
  * form (grid join + ignoreNulls last/first), run on synthetic input
  * the fixture cannot provide (its events.value has no nulls):
  * all-null interior hours, all-null BOUNDARY hours, an all-null
  * user. */
class GapfillSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The pre-r13 two-window reference implementation. */
  private def referenceForm(events: DataFrame): DataFrame = {
    val obs = events
      .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("t"),
        col("value"))
      .groupBy(col("user_id"), col("t")).agg(avg(col("value")).as("v"))
    val grid = obs.groupBy(col("user_id"))
      .agg(min(col("t")).as("t0"), max(col("t")).as("t1"))
      .select(col("user_id"), explode(sequence(col("t0"), col("t1"))).as("t"))
    val wb = Window.partitionBy(col("user_id")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(col("user_id")).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = grid.join(obs, Seq("user_id", "t"), "left_outer")
      .withColumn("p", last(when(col("v").isNotNull,
        struct(col("t").as("pt"), col("v").as("pv"))), ignoreNulls = true).over(wb))
      .withColumn("nx", last(when(col("v").isNotNull,
        struct(col("t").as("nt"), col("v").as("nv"))), ignoreNulls = true).over(wf))
      .withColumn("filled",
        when(col("v").isNotNull, col("v"))
          .when(col("p").isNotNull && col("nx").isNotNull,
            col("p.pv") + (col("nx.nv") - col("p.pv")) *
              (col("t") - col("p.pt")) / (col("nx.nt") - col("p.pt")))
          .otherwise(coalesce(col("p.pv"), col("nx.nv"))))
    filled.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_points"),
        sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n_observed"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_filled"),
        sum(round(col("filled") * 10000).cast("long")).as("sum_filled_e4"))
      .orderBy(col("user_id"))
  }

  private def ts(h: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${h}%02d:30:00")

  test("null-hour semantics match the two-window reference form") {
    val rows: Seq[(Long, Timestamp, Option[Double])] = Seq(
      // u1: plain gaps, two events in one hour (avg path)
      (1L, ts(0), Some(10.0)), (1L, ts(0), Some(20.0)),
      (1L, ts(3), Some(40.0)), (1L, ts(7), Some(12.5)),
      // u2: interior hour 2 exists but is ALL-NULL -> a fill point
      // interpolated across it, never an anchor
      (2L, ts(0), Some(1.0)), (2L, ts(2), None), (2L, ts(5), Some(11.0)),
      // u3: all-null hours at BOTH grid boundaries -> carry-back and
      // carry-forward from the nearest anchors
      (3L, ts(0), None), (3L, ts(1), Some(5.0)),
      (3L, ts(4), Some(8.0)), (3L, ts(6), None),
      // u4: no anchors at all -> full grid of null fills
      (4L, ts(1), None), (4L, ts(3), None))
    val events = rows.toDF("user_id", "ts", "value")
    val got = graft.queries.EventsPack.gapfill(events).collect().toSeq
    val exp = referenceForm(events).collect().toSeq
    assert(got.map(_.toSeq) == exp.map(_.toSeq))
    // and the expectations are what the scenario says they are
    val byUser = exp.map(r => r.getLong(0) -> r.toSeq).toMap
    // u2: 6 grid hours, 2 anchors, 4 fills (incl. the all-null hour 2,
    // interpolated across — not treated as an anchor)
    assert(byUser(2L).slice(1, 4) == Seq(6L, 2L, 4L))
    // u3: 7 grid hours bounded by the null-v hours, 2 anchors
    assert(byUser(3L).slice(1, 4) == Seq(7L, 2L, 5L))
    // u4: no anchors — every fill null, sum degenerates to null
    assert(byUser(4L).slice(1, 5) == Seq(3L, 0L, 3L, null))
  }

  test("fixture parity: span form equals the reference form at sf") {
    val events = Tables.events(spark, TestSpark.sf)
    val got = graft.queries.EventsPack.gapfill(events).collect().toSeq
    val exp = referenceForm(events).collect().toSeq
    assert(got.map(_.toSeq) == exp.map(_.toSeq))
  }
}
