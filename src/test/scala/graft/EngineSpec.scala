package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingHash
import graft.streaming.EventStream

/** Driver-contract and extension-surface smoke tests. */
class EngineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("entry: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // pins against a pack silently dropping out of SparkEntry.packs
    // (r16 floor: 234 registered queries)
    assert(SparkEntry.queries.size >= 241)
  }

  test("every query returns rows at sf0.001") {
    val empties = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val n = fn(spark, TestSpark.sf).count()
      if (n == 0) Some(name) else None
    }
    // candidate-pair queries may legitimately be empty at tiny SF; all
    // others must produce rows (q_anti_join and q_theta_pairs left this
    // list in r12: the 1998-scoped / region-grouped forms are non-empty
    // at every SF). q_split_leakage (pairs at the stricter 0.5
    // threshold) and q_knn_graph (mutual edges at the 0.2 cosine
    // floor) joined in r17: both derive from relations this list
    // already grants may be empty on a tiny or regenerated fixture.
    assert(empties.toSet.subsetOf(Set("q_ngram_jaccard", "q_minhash_lsh",
      "q_simhash_dedup", "q_split_leakage", "q_knn_graph",
      "q_knn_triangles")),
      s"unexpected empty: $empties")
  }

  test("ohlc bars: low <= open/close <= high, bars ordered and non-empty") {
    val bars = graft.queries.EventsPack.qOhlcBars(spark, TestSpark.sf)
      .as[(Long, Long, Double, Double, Double, Double, Double)].collect()
    assert(bars.nonEmpty)
    assert(bars.map(_._1).toSeq == bars.map(_._1).sorted.toSeq)
    bars.foreach { case (w, n, open, high, low, close, _) =>
      assert(n >= 1, s"bar $w empty")
      assert(low <= math.min(open, close) && math.max(open, close) <= high,
        s"bar $w OHLC ordering violated")
    }
  }

  test("rolling_hash: codegen expression matches reference impl") {
    val texts = Seq("", "a", "hello world", "🦄 utf8")
    val got = texts.toDF("t")
      .select(RollingHash.rolling_hash(col("t")).as("h")).as[Long].collect()
    val want = texts.map(t => RollingHash.hash(t.getBytes("UTF-8")))
    assert(got.toSeq == want)
  }

  test("stateful streaming totals converge to the batch aggregate") {
    import org.apache.spark.sql.streaming.OutputMode
    val q = graft.streaming.EventStream.runningUserTotals(spark, TestSpark.sf)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("graft_state_test").start()
    try q.processAllAvailable() finally q.stop()
    // update mode appends refreshed rows per batch; the final state per
    // user is the max-count row
    val finalState = spark.table("graft_state_test")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
    val batch = Tables.events(spark, TestSpark.sf)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
    assert(finalState.except(batch).count() == 0)
    assert(batch.except(finalState).count() == 0)
  }

  test("streaming windowed agg matches the batch tumbling-window query") {
    val stream = EventStream.runOnce(spark, TestSpark.sf, "graft_stream_test")
      .select("wstart", "n", "sum_value").orderBy("wstart").collect()
    val batch = graft.queries.EventsPack.qTumblingWindow(spark, TestSpark.sf)
      .select("wstart", "n", "sum_value").orderBy("wstart").collect()
    assert(stream.toSeq == batch.toSeq)
  }

  test("dropDuplicatesWithinWatermark dedups in-window with bounded state") {
    // duplicate the source by unioning two reads of the same stream;
    // the watermark-bounded dedup (finite state at 100 TB, unlike
    // plain dropDuplicates whose key state grows with the corpus)
    // must collapse the union back to the batch row count
    val dup = EventStream.eventsStream(spark, TestSpark.sf)
      .union(EventStream.eventsStream(spark, TestSpark.sf))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "4")
    try {
      val q = dup.writeStream.outputMode("append")
        .format("memory").queryName("graft_wm_dedup_test").start()
      try q.processAllAvailable() finally q.stop()
    } finally spark.conf.set(key, prev)
    val got = spark.table("graft_wm_dedup_test").count()
    assert(got == Tables.events(spark, TestSpark.sf).count())
  }

  test("windowed agg stays exact across multiple micro-batches") {
    // the fixture arrives as ONE file = one micro-batch, so the
    // single-batch drains never advance the watermark mid-stream;
    // stage the events as 4 time-ordered files and feed them one per
    // trigger so state actually carries (and the watermark actually
    // moves) across batches. In-order arrival means nothing is late,
    // so the multi-batch streaming answer must equal the batch agg.
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_multibatch").toString
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
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours").as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").cast("long").as("wstart"), col("n"), col("sum_value"))
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "4")
    val q = try {
      val q0 = stream.writeStream.outputMode("complete")
        .format("memory").queryName("graft_multibatch_test").start()
      try { q0.processAllAvailable(); q0 } finally q0.stop()
    } finally spark.conf.set(key, prev)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
      s"expected >=4 non-empty micro-batches, got ${q.recentProgress.length}")
    val got = spark.table("graft_multibatch_test")
      .orderBy("wstart").collect().toSeq
    val want = graft.queries.EventsPack.qTumblingWindow(spark, TestSpark.sf)
      .select("wstart", "n", "sum_value").orderBy("wstart").collect().toSeq
    assert(got == want)
  }

  test("stream-stream join reproduces the batch interval join exactly") {
    val stream = EventStream.runJoinOnce(spark, TestSpark.sf, "graft_ssj_test")
      .select("user_id", "click_id", "purchase_id")
    val ev = Tables.events(spark, TestSpark.sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").as("ts_c"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").cast("long").as("u2"),
        col("ts").as("ts_p"), col("event_id").as("purchase_id"))
    val batch = clicks.join(purchases,
        col("user_id") === col("u2")
          && col("ts_p") >= col("ts_c")
          && col("ts_p") <= col("ts_c") + expr("INTERVAL 1 HOUR"))
      .select("user_id", "click_id", "purchase_id")
    assert(stream.count() > 0)
    assert(stream.except(batch).count() == 0)
    assert(batch.except(stream).count() == 0)
  }
}
