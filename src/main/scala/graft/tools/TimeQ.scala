package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query timing harness for optimization work: runs the named
  * queries through the same noop-sink protocol as graft.Bench (same
  * session config, same clearCache between samples), printing every
  * sample plus the min — so a candidate change can be A/B-measured in
  * seconds instead of a full-battery run. Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.TimeQ <reps> name [name...]"
  * Shared silver tables are prepared (untimed) iff any named query
  * consumes them, mirroring the bench's prepareShared split. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val names =
      if (args.drop(1).toSeq == Seq("ALL"))
        graft.SparkEntry.queries.keys.toSeq.sorted
      else args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
    val spark =
      (if (new java.io.File("/dev/shm").isDirectory)
        b0.config("spark.graft.stream.checkpointDir", "/dev/shm/graft_ckpt")
      else b0).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // A/B experiment hook: semicolon-separated k=v runtime SQL confs
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
      println(s"[timeq] conf $k=$v")
    })
    // same warm-up as Bench: JIT/codegen the common paths untimed
    locally {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity"))).count()
      li.join(broadcast(li.select(col("l_orderkey").as("k")).limit(10)),
        col("l_orderkey") === col("k")).count()
      spark.read.parquet(s"$sfDir/documents.parquet").count()
      spark.catalog.clearCache()
    }
    graft.queries.TextPack.prepareShared(spark, sfDir)
    graft.queries.SimilarityPack.prepareSharedKnn(spark, sfDir)
    graft.queries.SimilarityPack.prepareSharedAdc(spark, sfDir)
    spark.catalog.clearCache()
    // Deterministic work metrics, immune to host noise: job/stage/task
    // counts and shuffle bytes per query execution. Wall time on this
    // box swings 2-10x with hypervisor load; task counts do not.
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    val shuffleB = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(e.stageInfo.numTasks)
          shuffleB.addAndGet(e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          ()
        }
      })
    def snap(): (Long, Long, Long, Long) =
      (jobs.get(), stages.get(), tasks.get(), shuffleB.get())
    // SWEEP-interleaved sampling (the Bench protocol): consecutive
    // samples of one query land in the same host-contention window;
    // spacing a query's samples a full sweep apart lets min-of-k
    // reject windows shorter than a sweep
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    val work = scala.collection.mutable.Map[String, (Long, Long, Long, Long)]()
    (1 to reps).foreach { _ =>
      names.foreach { n =>
        val fn = graft.SparkEntry.queries(n)
        val before = snap()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        samples(n) = samples(n) :+ (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a beat before reading
        Thread.sleep(120)
        val after = snap()
        work(n) = (after._1 - before._1, after._2 - before._2,
          after._3 - before._3, after._4 - before._4)
      }
    }
    names.foreach { n =>
      val ts = samples(n)
      val (j, st, tk, sb) = work(n)
      println(f"[timeq] $n%-28s min=${ts.min}%.3f jobs=$j stages=$st " +
        f"tasks=$tk shufKB=${sb / 1024} samples=" +
        ts.map(t => f"$t%.3f").mkString(","))
    }
    spark.stop()
  }
}
