package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** The streaming MERGE sink's multi-batch accumulation path, which
  * the driver query's one-file replay cannot reach: events staged as
  * 4 time-ordered files feed one micro-batch each, so the snapshot is
  * CDC-applied 4 times — later batches must REPLACE earlier rows for
  * re-touched keys and INSERT first-seen keys, and the final snapshot
  * must equal the batch aggregate exactly. */
class StreamingUpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("4-batch streaming MERGE snapshot equals the batch groupBy") {
    import java.nio.file.{Files, Paths}
    val dir = TempDirs.create("graft_upsert_multibatch").toString
    val ev = Tables.events(spark, TestSpark.sf)
    val bucketed = ev.withColumn("bucket", ntile(4).over(
      org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    (1 to 4).foreach { b =>
      val stage = s"$dir/stage_$b"
      bucketed.filter(col("bucket") === b).drop("bucket")
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(s"$dir/b$b.parquet"))
    }
    val schema = spark.read.parquet(s"$dir/b1.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/b*.parquet")
    val got = EventStream.drainMergeSink(
        spark, EventStream.upsertTotalsAgg(stream), "user_id")
      .orderBy("user_id").collect().toSeq
    val want = ev
      .select(col("user_id").cast("long").as("user_id"), col("value"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total"))
      .orderBy("user_id").collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }
}
