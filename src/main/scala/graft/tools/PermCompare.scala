package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Tables, TempDirs}
import graft.operators.{EraRank, Folds}

/** Old-vs-new cost of the two-pass positional permutation at a blown-up
  * scale (VERDICT r11 task 7 evidence): times, on the UNscoped lineitem
  * permutation workload,
  *   (a) the one-pass [[Folds.permuteWithinEra]] (the small-era default),
  *   (b) the r12 shared-pass [[Folds.permuteWithinEraTwoPass]]
  *       (one fused sketch + one persisted bucketed base), and
  *   (c) the r11 form it replaced — two independent
  *       [[EraRank.withRowNumberTwoPass]] pipelines joined positionally —
  * reconstructed here verbatim so the saving is measured, not asserted.
  *
  * Usage: SPARK_GRAFT_PROBE_FACTOR=30 sbt "runMain graft.tools.PermCompare"
  */
object PermCompare {

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_PROBE_FACTOR", "30").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val big = TempDirs.create("graft_permcmp_").toAbsolutePath.toString
    ScaleProbe.buildBlowup(spark, base, big, factor)

    def baseFrame(d: String): DataFrame =
      Tables.lineitem(spark, d)
        .select(Tables.eraOfDate(col("l_shipdate")).as("era"),
          col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val hashKey =
      (col("l_orderkey") * lit(2654435761L) + col("l_linenumber") * lit(40503L)
        + col("l_partkey") * lit(7919L) + col("l_suppkey") * lit(104729L)) % lit(999999937L)
    val ids = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")

    // the r11 form: two independent two-pass rank pipelines
    def oldTwoPass(df: DataFrame): DataFrame = {
      val keep = df.columns.filterNot(_ == "l_quantity").map(col)
      val a = EraRank.withRowNumberTwoPass(df, "graft_rn", 32,
          col("era"), col(ids.head), ids.tail.map(col): _*)
        .select((keep :+ col("graft_rn")): _*)
      val b = EraRank.withRowNumberTwoPass(df, "graft_rn", 32,
          col("era"), hashKey, ids.map(col): _*)
        .select(col("era").as("graft_era_b"), col("graft_rn").as("graft_rn_b"),
          col("l_quantity"))
      a.join(b, a("era") === col("graft_era_b") &&
          col("graft_rn") === col("graft_rn_b"))
        .drop("graft_rn", "graft_rn_b", "graft_era_b")
    }

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best(mk: => DataFrame): Double =
      (1 to 2).map { _ =>
        val t = timed(mk.write.mode("overwrite").format("noop").save())
        spark.catalog.clearCache()
        t
      }.min
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val onePass = best(Folds.permuteWithinEra(baseFrame(big), "l_quantity",
      "era", ids, hashKey))
    val shared = best(Folds.permuteWithinEraTwoPass(baseFrame(big), "l_quantity",
      "era", ids, hashKey))
    val old = best(oldTwoPass(baseFrame(big)))
    println(s"""{"metric":"perm_compare","factor":$factor,"one_pass":${fmt(onePass)},"two_pass_shared":${fmt(shared)},"two_pass_old":${fmt(old)}}""")
    spark.stop()
  }
}
