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

  test("r14 text operators on an empty / all-short documents fixture") {
    import spark.implicits._
    val dir = TempDirs.create("graft_degen_doc_").toString
    // docs all shorter than the 8-word window, plus one empty string
    Seq((1L, "a b c"), (2L, ""), (3L, "one two three four five"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    // no window reaches length 8 -> no duplicated window -> empty,
    // not a crash (posexplode of an empty hash array drops the doc)
    assert(graft.queries.TextPack.qRepeatedPassages(spark, dir).count() == 0)
    // containment: too short for any 3-shingle overlap pair -> empty
    assert(graft.queries.TextPack.qContainment(spark, dir).count() == 0)
  }

  test("IVF-PQ build refuses an empty corpus loudly") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.operators.IvfPq.build(empty, k = 4, m = 8, kc = 4, seed = 1L)
    }
    assert(e.getMessage.contains("empty training sample"))
  }

  test("adaptive permutation on an empty frame returns empty (one-pass branch)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Double)].toDF("era", "id", "v")
    val got = graft.operators.Folds.permuteWithinEraAdaptive(
      empty, "v", "era", Seq("id"), col("id") % 7)
    assert(got.count() == 0)
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
