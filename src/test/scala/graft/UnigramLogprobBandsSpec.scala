package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextPack

/** The sketch-banded production twin of q_unigram_logprob: agreement
  * with the exact terciles, and exactness away from the boundaries. */
class UnigramLogprobBandsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val docs = Tables.documents(spark, TestSpark.sf)
  private lazy val exact = TextPack.qUnigramLogprob(spark, TestSpark.sf)
    .select(col("doc_id"), col("lang"), col("logprob"),
      col("band").as("band_exact"))
  private lazy val approx = TextPack.unigramLogprobBandsApprox(docs)
    .select(col("doc_id"), col("band").as("band_approx"))

  test("approx bands agree with exact terciles on >= 95% of docs") {
    val joined = exact.join(approx, "doc_id").cache()
    val n = joined.count()
    val agree = joined.filter(col("band_exact") === col("band_approx")).count()
    assert(n > 0 && agree >= (n * 0.95).toLong,
      s"only $agree/$n docs agree")
    joined.unpersist()
  }

  test("disagreements only at band boundaries (adjacent bands, near the cut)") {
    val joined = exact.join(approx, "doc_id")
      .filter(col("band_exact") =!= col("band_approx"))
    // head<->tail flips would mean the sketch is broken, not merely
    // epsilon-off: every disagreement must be between adjacent bands
    val farFlips = joined.filter(
      (col("band_exact") === "head" && col("band_approx") === "tail") ||
      (col("band_exact") === "tail" && col("band_approx") === "head")).count()
    assert(farFlips == 0)
  }

  test("per-language band sizes stay within sketch error of n/3") {
    val sizes = approx.join(exact.select("doc_id", "lang"), "doc_id")
      .groupBy("lang", "band_approx").agg(count(lit(1)).as("n"))
      .groupBy("lang").agg(max(col("n")).as("mx"), min(col("n")).as("mn"),
        sum(col("n")).as("tot"))
      .collect()
    sizes.foreach { r =>
      val third = r.getLong(3) / 3.0
      assert(r.getLong(1) <= third * 1.3 && r.getLong(2) >= third * 0.7,
        s"lang ${r.getString(0)} bands ${r.getLong(2)}..${r.getLong(1)} vs n/3 $third")
    }
  }
}
