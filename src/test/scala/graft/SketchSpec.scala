package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins the sketches' OBSERVED error on the fixtures well inside the
  * 10%/5% contracts the driver queries publish — if an engine upgrade
  * degrades the sketch, this fails before the oracle boolean does.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("HLL++ distinct error under 5% per event_type on the fixture") {
    val errs = Tables.events(spark, TestSpark.sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("ex"),
        approx_count_distinct(col("user_id"), rsd = 0.05).as("ap"))
      .select((abs(col("ap") - col("ex")) / col("ex")).as("rel"))
      .as[Double].collect()
    assert(errs.nonEmpty && errs.forall(_ <= 0.05), errs.mkString(","))
  }

  test("approx_percentile(100) median error under 2% on the fixture") {
    val errs = Tables.events(spark, TestSpark.sf)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("ex"),
        expr("approx_percentile(value, 0.5, 100)").as("ap"))
      .select((abs(col("ap") - col("ex")) / greatest(abs(col("ex")), lit(1.0))).as("rel"))
      .as[Double].collect()
    assert(errs.nonEmpty && errs.forall(_ <= 0.02), errs.mkString(","))
  }

  test("driver sketch queries report approx_ok for every group") {
    for (name <- Seq("q_sketch_distinct", "q_sketch_quantile")) {
      val bad = SparkEntry.queries(name)(spark, TestSpark.sf)
        .filter(!col("approx_ok")).count()
      assert(bad == 0, s"$name has $bad groups outside the error contract")
    }
  }
}
