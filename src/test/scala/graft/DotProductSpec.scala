package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.DotProduct.dot_product

/** The native DotProduct expression must be bit-identical to the
  * higher-order composition it replaces (same index-order summation),
  * survive codegen (no CodegenFallback in its span), and be callable
  * from SQL via GraftExtensions.
  */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the aggregate(zip_with) form on fixture vectors") {
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val q = e.limit(5).select(col("v").as("qv"))
    val both = e.crossJoin(broadcast(q))
      .select(dot_product(col("v"), col("qv")).as("native"),
        hofDot(col("v"), col("qv")).as("hof"))
      .as[(Double, Double)].collect()
    assert(both.nonEmpty)
    // exact equality, not tolerance: summation order is identical
    assert(both.forall { case (n, h) => n == h })
  }

  test("mismatched lengths use the common prefix; null elements add 0") {
    val r = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)))
      .toDF("a", "b")
      .select(dot_product(col("a"), col("b"))).as[Double].head()
    assert(r == 1.0 * 4.0 + 2.0 * 5.0)
    val withNull = spark.sql(
      "SELECT array(1.0d, CAST(NULL AS DOUBLE), 3.0d) a, array(2.0d, 9.0d, 4.0d) b")
      .select(dot_product(col("a"), col("b"))).as[Double].head()
    assert(withNull == 1.0 * 2.0 + 3.0 * 4.0)
  }

  test("stays inside whole-stage codegen (not CodegenFallback)") {
    val df = Tables.embeddings(spark, TestSpark.sf)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
      .select(dot_product(col("v"), col("v")).as("d"))
      .filter(col("d") >= 0)
    val p = df.queryExecution.executedPlan.toString
    // the `*(n)` prefix marks operators inside a WholeStageCodegen
    // span in the physical-plan string; the dotproduct projection
    // must carry it (a CodegenFallback expression would strip it)
    assert(p.linesIterator.exists(l =>
      l.contains("dotproduct") && l.trim.startsWith("*")), p.take(600))
    // force execution through the generated path
    assert(df.count() > 0)
  }

  test("SQL-callable as dot_product() (the GraftExtensions injectFunction path)") {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => graft.functions.DotProduct(exprs(0), exprs(1)), "scala_udf")
    val v = spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(v == 11.0)
  }
}
