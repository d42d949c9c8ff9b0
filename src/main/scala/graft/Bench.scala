package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: JIT/janino-compile the common codegen paths
    // (scan, hash agg, window, broadcast join) so per-query timings
    // measure plan execution, not first-use compiler latency
    locally {
      import org.apache.spark.sql.functions._
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000)
      li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity"))).count()
      li.withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag")).orderBy(col("l_orderkey")))).count()
      li.join(broadcast(li.select(col("l_orderkey").as("k")).limit(10)),
        col("l_orderkey") === col("k")).count()
      spark.catalog.clearCache()
    }
    // shared pipeline materializations are timed as their own entry so
    // per-query timings stay honest: q_ngram_jaccard / q_dedup_apply
    // read the pair table this step builds instead of one of them
    // silently paying the whole shingle pipeline
    val tShared = System.nanoTime()
    val sharedOk =
      try { graft.queries.TextPack.prepareShared(spark, sfDir); true }
      catch { case _: Throwable => false }
    val sharedSec = (System.nanoTime() - tShared) / 1e9
    spark.catalog.clearCache()
    // fixed (sorted) query order: Map iteration order reshuffles as
    // queries are added, which moves warm-up costs between rounds and
    // makes per-query timings incomparable round over round
    val results = ("_shared_pairs" -> (sharedOk, sharedSec)) +:
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        // drop per-query persisted frames so cache pressure from one
        // query never skews the next one's timing
        spark.catalog.clearCache()
        name -> (ok, (System.nanoTime() - t0) / 1e9)
      }
    val qs = results.map { case (k, (ok, v)) =>
      // a failed query is recorded as a negative time so a fast
      // failure can never read as a fast pass
      s"\"" + k + "\":" + (if (ok) v else -v)
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, (false, _)) => s"\"$k\"" }
      .mkString("[", ",", "]")
    // headline total covers successful work only; failures are listed
    // in `errors` (and negative per-query times), never mixed into the
    // benchmark figure
    val total = results.collect { case (_, (true, v)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
