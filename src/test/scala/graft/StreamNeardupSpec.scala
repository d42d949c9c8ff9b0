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

  test("silver write -> read-back: identical rows and identical stream output") {
    val silver = TempDirs.create("graft_nd_silver_spec")
    try {
      val inline = graft.queries.TextPack
        .minhashIndex(spark, TestSpark.sf, col("doc_id") % 5 =!= 0)
      val readBack = EventStream.writeNeardupIndex(
        spark, TestSpark.sf, silver.toString)
      // the silver table IS the index: same rows, nothing lost in the
      // parquet round-trip (mh array included)
      assert(readBack.count() == inline.count())
      assert(readBack.exceptAll(inline).isEmpty && inline.exceptAll(readBack).isEmpty)
      // and the stream joined against the READ-BACK relation emits
      // exactly what the inline index does
      val live = docs.filter(col("doc_id") % 5 === 0)
        .as[(Long, String)].collect().toSeq
      val viaSilver = drainBatched(live.grouped(41).toSeq, readBack, "graft_nd_silver")
      val viaInline = drainBatched(Seq(live), inline, "graft_nd_inline")
      assert(viaSilver.nonEmpty && viaSilver == viaInline)
    } finally TempDirs.deleteRecursively(silver)
  }

  test("index staleness and rebuild: unindexed history is invisible until rewrite") {
    val silver = TempDirs.create("graft_nd_stale_spec")
    try {
      val live = docs.filter(col("doc_id") % 5 === 0)
        .as[(Long, String)].collect().toSeq
      val full = EventStream.writeNeardupIndex(spark, TestSpark.sf, silver.toString)
      val fresh = drainBatched(Seq(live), full, "graft_nd_fresh")
      assert(fresh.nonEmpty)
      // STALE index: rebuilt as if the highest-id matching history doc
      // had not been ingested yet — its matches must disappear, and
      // nothing else may change (stale ⊂ fresh, difference exactly
      // that doc's rows)
      val cutoff = fresh.map(_._2).max
      val stale = EventStream.writeNeardupIndex(spark, TestSpark.sf,
        silver.toString, pred = col("doc_id") % 5 =!= 0 && col("doc_id") < cutoff)
      val staleOut = drainBatched(Seq(live), stale, "graft_nd_stale")
      assert(staleOut == fresh.filter(_._2 != cutoff))
      assert(staleOut.subsetOf(fresh) && staleOut != fresh)
      // REBUILD with the full predicate restores the fresh output
      val rebuilt = EventStream.writeNeardupIndex(spark, TestSpark.sf, silver.toString)
      assert(drainBatched(Seq(live), rebuilt, "graft_nd_rebuilt") == fresh)
    } finally TempDirs.deleteRecursively(silver)
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
