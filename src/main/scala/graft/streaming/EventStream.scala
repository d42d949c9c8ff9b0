package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY §2.10 — engine-new, the
  * streaming generalization of the reference's batch era processing):
  * the same tumbling-window aggregation as EventsPack.qTumblingWindow,
  * expressed as readStream → watermark → windowed agg, so the era
  * concept carries over to unbounded input with late-data handling.
  */
object EventStream {

  /** Streaming plan over the events fixture directory. The file source
    * replays the parquet as a stream; schema comes from a batch peek
    * (streaming sources need an explicit schema). */
  def windowedAgg(spark: SparkSession, dir: String,
                  window_ : String = "6 hours",
                  watermark: String = "1 hour"): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    // the file stream source requires a directory; the fixture is a
    // single file, so stage it behind a symlink in a temp dir (in
    // production the source is already a directory of arriving files)
    val src = new java.io.File(path)
    val streamPath =
      if (src.isFile) {
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_src")
        java.nio.file.Files.createSymbolicLink(
          tmp.resolve("events.parquet"), src.toPath.toAbsolutePath)
        tmp.toString
      } else path
    val raw = spark.readStream.schema(schema).parquet(streamPath)
    val events =
      if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").cast("long").as("wstart"), col("n"), col("sum_value"))
  }

  case class UserTotals(user_id: Long, n_events: Long, total: Double)

  /** Stateful streaming (custom per-key state via mapGroupsWithState):
    * running per-user event counts/sums maintained in GroupState — the
    * building block for streaming feature backfills. Update-mode
    * output; each micro-batch emits the refreshed totals for keys it
    * touched. */
  def runningUserTotals(spark: SparkSession, dir: String): org.apache.spark.sql.Dataset[UserTotals] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val base = windowedSource(spark, dir)
      .select(col("user_id").cast("long").as("user_id"), col("value"))
      .as[(Long, Double)]
    base.groupByKey(_._1)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          val (dn, dsum) = rows.foldLeft((0L, 0.0)) {
            case ((c, s2), (_, v)) => (c + 1, s2 + v)
          }
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          val next = UserTotals(uid, prev.n_events + dn, prev.total + dsum)
          state.update(next)
          next
      }
  }

  /** The schema'd streaming source with ts normalized (shared by the
    * windowed and stateful queries). */
  private def windowedSource(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val src = new java.io.File(path)
    val streamPath =
      if (src.isFile) {
        val tmp = java.nio.file.Files.createTempDirectory("graft_stream_src")
        java.nio.file.Files.createSymbolicLink(
          tmp.resolve("events.parquet"), src.toPath.toAbsolutePath)
        tmp.toString
      } else path
    val raw = spark.readStream.schema(schema).parquet(streamPath)
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }

  /** Drain the stream synchronously into a memory sink and return the
    * completed result (test/driver harness helper). */
  def runOnce(spark: SparkSession, dir: String, name: String = "graft_stream"): DataFrame = {
    val q = windowedAgg(spark, dir)
      .writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }
}
