package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Degenerate-input parity for the r13 hardened entries: the
  * empty/one-instant relations their oracles still define answers
  * for. Each case builds a throwaway fixture dir (the queries take a
  * fixture DIRECTORY, not a DataFrame). */
class DegenerateInputSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("analyze-stats on an EMPTY lineitem still profiles all 6 columns") {
    val dir = TempDirs.create("graft_degen_li_").toString
    Tables.lineitem(spark, TestSpark.sf).limit(0)
      .write.parquet(s"$dir/lineitem.parquet")
    val rows = graft.queries.CorePack.qAnalyzeStats(spark, dir).collect()
    assert(rows.length == 6)
    assert(rows.forall(r => r.getLong(1) == 0L && r.getLong(2) == 0L
      && r.getLong(3) == 0L && r.isNullAt(4) && r.isNullAt(5)))
  }

  test("warm-start migration degrades to the plain stream on a one-instant fixture") {
    // all events share one timestamp -> the archive half is empty and
    // the old path NPE'd on its null max; the guarded path must run
    // the plain full-history stream instead (here: nothing closes
    // under the final watermark, so the defined answer is empty)
    val dir = TempDirs.create("graft_degen_ev_").toString
    Tables.events(spark, TestSpark.sf).limit(5)
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .write.parquet(s"$dir/events.parquet")
    val warm = EventStream.runWarmSessionsOnce(spark, dir, "graft_degen_warm")
      .collect().toSeq
    val full = EventStream.runClosedSessionsTwsOnce(spark, dir, "graft_degen_full")
      .orderBy(col("user_id"), col("start_us")).collect().toSeq
    assert(warm.map(_.toSeq) == full.map(_.toSeq))
  }
}
