package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream
import graft.streaming.EventStream.SessionOut

/** The flatMapGroupsWithState sessionization arms the driver query
  * can't reach on a one-batch replay: the event-time TIMEOUT close
  * ("the watermark passed last+gap with no successor event") and
  * cross-batch state carry/merge. */
class StatefulSessionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermark closes both sessions, open stays silent") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = EventStream.closedSessions(
      input.toDS().toDF("user_id", "ts"), gapMinutes = 30)

    val name = "graft_stateful_session_spec"
    val q = sessions.toDF().writeStream
      .outputMode("append").format("memory").queryName(name).start()
    try {
      // batch 1 — user 1: two events 5 min apart, then a 55-min jump:
      // two open intervals; nothing closes (watermark still 0)
      input.addData(
        (1L, ts("2024-01-01 00:00:00")),
        (1L, ts("2024-01-01 00:05:00")),
        (1L, ts("2024-01-01 01:00:00")))
      q.processAllAvailable()
      // batch 2 — user 2 far in the future: advances the watermark
      // (1h delay) past BOTH of user 1's horizons (00:35 and 01:30)
      input.addData((2L, ts("2024-01-01 05:00:00")))
      q.processAllAvailable()
      // batch 3 — timeouts fire against the batch-2 watermark
      input.addData((2L, ts("2024-01-01 05:01:00")))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table(name).as[SessionOut].collect().toSet
    def us(s: String): Long = ts(s).getTime * 1000L
    assert(got == Set(
      // watermark (04:00) passed 00:35
      SessionOut(1L, us("2024-01-01 00:00:00"), us("2024-01-01 00:05:00"), 2L),
      // watermark passed 01:30
      SessionOut(1L, us("2024-01-01 01:00:00"), us("2024-01-01 01:00:00"), 1L)))
    // user 2's session is still open — nothing emitted for it
    assert(!got.exists(_.user_id == 2L))
  }

  test("catch-up batch closes history against the prospective watermark") {
    // A backfill delivers a whole multi-day history in ONE batch while
    // the engine watermark is still 0. The close test runs against the
    // prospective watermark (batch max event time - 1h), so the three
    // old sessions must be emitted IN batch 0 — holding them until the
    // engine watermark catches up would make state O(total sessions)
    // for the whole replayed history instead of its ~4-interval tail.
    // Trigger.Once runs exactly one micro-batch and stops, so the
    // engine-watermark timeout batch never runs: only the prospective
    // close can put rows in the sink here.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = EventStream.closedSessions(
      input.toDS().toDF("user_id", "ts"), gapMinutes = 30)

    val name = "graft_stateful_session_spec4"
    input.addData(
      (5L, ts("2024-01-01 00:00:00")),
      (5L, ts("2024-01-01 03:00:00")),
      (5L, ts("2024-01-01 06:00:00")),
      (5L, ts("2024-01-02 00:00:00")))
    val q = sessions.toDF().writeStream
      .outputMode("append").format("memory").queryName(name)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .start()
    try q.awaitTermination() finally q.stop()

    val got = spark.table(name).as[SessionOut].collect().toSet
    def us(s: String): Long = ts(s).getTime * 1000L
    assert(got == Set(
      SessionOut(5L, us("2024-01-01 00:00:00"), us("2024-01-01 00:00:00"), 1L),
      SessionOut(5L, us("2024-01-01 03:00:00"), us("2024-01-01 03:00:00"), 1L),
      SessionOut(5L, us("2024-01-01 06:00:00"), us("2024-01-01 06:00:00"), 1L)))
  }

  test("late batch straddling the open session merges instead of mis-splitting") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = EventStream.closedSessions(
      input.toDS().toDF("user_id", "ts"), gapMinutes = 30)

    val name = "graft_stateful_session_spec2"
    val q = sessions.toDF().writeStream
      .outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData((7L, ts("2024-01-01 02:00:00")))
      q.processAllAvailable()
      // a late-but-inside-watermark event 10 min BEFORE the open
      // session start must extend it backwards, not open a new one
      input.addData((7L, ts("2024-01-01 01:50:00")))
      q.processAllAvailable()
      // successor beyond the gap; the merged session closes once the
      // watermark (04:00 - 1h -> 03:00) passes its 02:30 horizon
      input.addData((7L, ts("2024-01-01 04:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table(name).as[SessionOut].collect().toSet
    def us(s: String): Long = ts(s).getTime * 1000L
    assert(got == Set(
      SessionOut(7L, us("2024-01-01 01:50:00"), us("2024-01-01 02:00:00"), 2L)))
  }

  test("in-watermark straggler in the gap BEFORE the open interval merges, not mis-splits") {
    // The eager successor-domination close got this wrong: batch 1
    // closed [00:00] the moment [01:20] appeared, so batch 2's
    // in-watermark 00:25 event (watermark only 00:20) became a
    // spurious one-event session — two wrong rows where exact
    // sessionization yields one merged [00:00, 00:25] session.
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = EventStream.closedSessions(
      input.toDS().toDF("user_id", "ts"), gapMinutes = 30)

    val name = "graft_stateful_session_spec3"
    val q = sessions.toDF().writeStream
      .outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData(
        (9L, ts("2024-01-01 00:00:00")),
        (9L, ts("2024-01-01 01:20:00")))
      q.processAllAvailable() // watermark -> 00:20; both intervals open
      input.addData((9L, ts("2024-01-01 00:25:00")))
      q.processAllAvailable() // merges backward into [00:00, 00:25]
      // advance the watermark past every horizon to flush the closes
      input.addData((9L, ts("2024-01-01 06:00:00")))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table(name).as[SessionOut].collect().toSet
    def us(s: String): Long = ts(s).getTime * 1000L
    assert(got == Set(
      SessionOut(9L, us("2024-01-01 00:00:00"), us("2024-01-01 00:25:00"), 2L),
      SessionOut(9L, us("2024-01-01 01:20:00"), us("2024-01-01 01:20:00"), 1L)))
  }
}
