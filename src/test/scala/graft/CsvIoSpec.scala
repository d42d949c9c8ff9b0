package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** S1/S2 (`#cell-4`, `#cell-22`): CSV scan with explicit schema and
  * the append-mode leaderboard sink. */
class CsvIoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CSV append sink + schema'd scan round-trips the leaderboard") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val schema = StructType(Seq(
      StructField("technique", StringType),
      StructField("spearman", DoubleType),
      StructField("qme", DoubleType)))
    val r1 = Seq(("baseline", 0.047209, 0.026411)).toDF("technique", "spearman", "qme")
    val r2 = Seq(("mda_71", 0.049398, 0.026200)).toDF("technique", "spearman", "qme")
    r1.write.mode("append").option("header", "true").csv(dir)
    r2.write.mode("append").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(schema).csv(dir)
    assert(back.count() == 2)
    assert(back.agg(max("spearman")).as[Double].head() == 0.049398)
  }

  test("JSONL round-trip aggregate equals the direct parquet aggregate") {
    // the r15 JSONL source/sink pair: the written-and-read-back copy
    // must be value-exact, so the query's per-lang aggregate must
    // match the same aggregate computed on the original parquet
    val viaJsonl = graft.queries.CorePack
      .qJsonlRoundtrip(spark, TestSpark.sf)
      .collect().toSeq
    val direct = Tables.documents(spark, TestSpark.sf)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))
      .collect().toSeq
    assert(viaJsonl == direct)
    assert(viaJsonl.nonEmpty)
  }
}
