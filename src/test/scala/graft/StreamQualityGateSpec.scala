package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** The streaming quality gate's contract: every output row is a pure
  * function of (doc, model), so the result is identical however the
  * live docs are batched; unknown languages are quarantined; OOV
  * accounting and the entropy-relative keep bit are exact. */
class StreamQualityGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private type Row6 = (Long, String, Long, Long, Double, Long)

  private lazy val (lpm, thm) = {
    val hist = Tables.documents(spark, TestSpark.sf)
      .filter(col("doc_id") % 5 =!= 0)
    val (model, thr) = graft.queries.TextPack.unigramModelRelations(hist)
    (EventStream.collectModel(model), EventStream.collectThresholds(thr))
  }

  private def drainBatched(batches: Seq[Seq[(Long, String, String)]],
                           name: String): Set[Row6] = {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val q = EventStream.qualityScore(
        input.toDS().toDF("doc_id", "lang", "text"), lpm, thm)
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[Row6].collect().toSet
  }

  test("output is independent of micro-batch boundaries and matches the batch kernel") {
    val live = Tables.documents(spark, TestSpark.sf)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("lang"), col("text"))
      .as[(Long, String, String)].collect().toSeq
    assert(live.nonEmpty)
    val oneBatch = drainBatched(Seq(live), "graft_qg_one")
    val rowWise = drainBatched(live.grouped(23).toSeq, "graft_qg_rows")
    val reversed = drainBatched(live.reverse.grouped(41).toSeq, "graft_qg_rev")
    val batch = EventStream.qualityScore(
      Tables.documents(spark, TestSpark.sf).filter(col("doc_id") % 5 === 0),
      lpm, thm).as[Row6].collect().toSet
    assert(oneBatch.nonEmpty)
    assert(oneBatch == rowWise && rowWise == reversed && reversed == batch)
  }

  test("unknown language is quarantined; OOV counting and keep bit are exact") {
    // "qq" never appears in the fixture's lang column; the all-OOV doc
    // in a KNOWN language scores ln(0.5/n) per token and must be cut
    val known = thm.keySet.head
    val rows = drainBatched(Seq(Seq(
      (1L, "qq", "whatever text this is"),
      (2L, known, "zzzunseen1 zzzunseen2 zzzunseen3"))), "graft_qg_edge")
    assert(!rows.exists(_._1 == 1L), "unknown-language doc must be quarantined")
    val r2 = rows.find(_._1 == 2L).get
    assert(r2._3 == 3L && r2._4 == 3L, "all three tokens are OOV")
    val n = thm(known)._2
    val want = BigDecimal(math.log(0.5 / n))
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r2._5 - want) < 1e-9)
    assert(r2._6 == 0L, "an all-OOV doc scores far below the entropy margin")
  }

  test("typical in-model text is kept; the gate actually cuts some fixture docs") {
    val out = EventStream.qualityScore(
      Tables.documents(spark, TestSpark.sf).filter(col("doc_id") % 5 === 0),
      lpm, thm).cache()
    val keeps = out.filter(col("keep") === 1L).count()
    val total = out.count()
    assert(keeps > 0, "a gate that keeps nothing is mis-thresholded")
    assert(keeps > total / 2,
      "in-distribution fixture docs should mostly pass their own corpus model")
    out.unpersist()
  }
}
