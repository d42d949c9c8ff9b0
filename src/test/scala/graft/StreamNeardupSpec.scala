package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** The streaming incremental near-dup's contract: every output row is
  * a pure function of (doc, history index), so the result must be
  * IDENTICAL however the live docs are batched — one batch, row-wise
  * batches, any order. The plan must stay stateless (no watermark, no
  * state store: the per-batch cost cannot depend on archive size). */
class StreamNeardupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Tables.documents(spark, TestSpark.sf)
    .select(col("doc_id"), col("text"))

  private def drainBatched(batches: Seq[Seq[(Long, String)]],
                           hist: org.apache.spark.sql.DataFrame,
                           name: String): Set[(Long, Long, Long)] = {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = EventStream.neardupJoin(
        input.toDS().toDF("doc_id", "text"), hist)
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[(Long, Long, Long)].collect().toSet
  }

  test("output is independent of micro-batch boundaries and matches the batch join") {
    val hist = graft.queries.TextPack
      .minhashIndex(spark, TestSpark.sf, col("doc_id") % 5 =!= 0).persist()
    try {
      val live = docs.filter(col("doc_id") % 5 === 0)
        .as[(Long, String)].collect().toSeq
      assert(live.nonEmpty)
      val oneBatch = drainBatched(Seq(live), hist, "graft_nd_one")
      val rowWise = drainBatched(live.grouped(37).toSeq, hist, "graft_nd_rows")
      val reversed = drainBatched(live.reverse.grouped(53).toSeq, hist, "graft_nd_rev")
      val batch = EventStream.neardupJoin(
          docs.filter(col("doc_id") % 5 === 0), hist)
        .as[(Long, Long, Long)].collect().toSet
      assert(oneBatch.nonEmpty)
      assert(oneBatch == rowWise && rowWise == reversed && reversed == batch)
    } finally hist.unpersist()
  }

  test("the streaming plan is stateless: no state store operators") {
    implicit val sq = spark.sqlContext
    val hist = graft.queries.TextPack
      .minhashIndex(spark, TestSpark.sf, col("doc_id") % 5 =!= 0)
    val input = MemoryStream[(Long, String)]
    val q = EventStream.neardupJoin(
        input.toDS().toDF("doc_id", "text"), hist)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_nd_plan").start()
    try {
      input.addData(docs.filter(col("doc_id") % 5 === 0)
        .as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
      val p = q.lastProgress
      assert(p.stateOperators.isEmpty,
        s"expected stateless plan, got ${p.stateOperators.length} state operators")
    } finally q.stop()
  }
}
