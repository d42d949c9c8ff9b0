package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Streaming vector search: the candidate emission is a pure function
  * of (vector, index) — identical however the live vectors are
  * batched — and the streamed result equals the same kernel run in
  * batch over the same index (the oracle already pins exact values;
  * these pin the streaming-specific seams). */
class StreamAnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val silver = {
    val out = graft.TempDirs.create("graft_ann_spec_silver")
    EventStream.writeAnnIndex(spark, TestSpark.sf, out.toString)
  }

  private lazy val liveRows = Tables.embeddings(spark, TestSpark.sf)
    .filter(col("vec_id") % 5 === 0)
    .select(col("vec_id"), col("embedding"))
    .as[(Long, Seq[Float])].collect().toSeq

  private def drainBatched(batches: Seq[Seq[(Long, Seq[Float])]],
                           name: String): Set[(Long, Long, Double)] = {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val q = EventStream.annProbeJoin(
        input.toDS().toDF("vec_id", "embedding"), silver._1, silver._2)
      .writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).as[(Long, Long, Double)].collect().toSet
  }

  test("candidate emission is independent of micro-batch boundaries and matches batch") {
    assert(liveRows.nonEmpty)
    val one = drainBatched(Seq(liveRows), "graft_sann_one")
    val small = drainBatched(liveRows.grouped(17).toSeq, "graft_sann_small")
    val rev = drainBatched(liveRows.reverse.grouped(31).toSeq, "graft_sann_rev")
    val batch = EventStream.annProbeJoin(
      Tables.embeddings(spark, TestSpark.sf).filter(col("vec_id") % 5 === 0)
        .select(col("vec_id"), col("embedding")),
      silver._1, silver._2).as[(Long, Long, Double)].collect().toSet
    assert(one.nonEmpty)
    assert(one == small && small == rev && rev == batch)
  }

  test("candidates stay inside probed clusters and above the floor; no self matches") {
    val out = drainBatched(Seq(liveRows), "graft_sann_inv")
    assert(out.forall(_._3 >= 0.2))
    assert(out.forall(r => r._1 != r._2))
    // every n_id is a history vector (archive slice), never live
    assert(out.forall(r => r._2 % 5 != 0))
  }
}
