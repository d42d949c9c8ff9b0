package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SignLshSig

/** The sign-LSH plane family has two implementations that must stay
  * bit-identical for ANY position: the JVM kernel
  * (SignLshSig.planeWeight, masked wrap) and the Catalyst Column form
  * (SimilarityPack.planeW, 16-bit-decomposed multiply). The Column
  * form runs under the session's ANSI arithmetic (Spark 4 default),
  * where a Long-overflowing multiply THROWS — the r13 review caught
  * the single-masked-multiply form doing exactly that from
  * pos ~3.5e3; this spec drives both to pos 5000. */
class PlaneFamilySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("column planeW equals the JVM kernel to pos 5000 under session arithmetic") {
    val qs = Seq(0L, 1L, 63L, 255L, 256L)
    val df = (1L to 5000L).toDF("pos")
      .crossJoin(qs.toDF("q"))
    val got = df.select(col("pos"), col("q"),
        graft.queries.SimilarityPack.planeW(col("pos"), col("q")).as("w"))
      .as[(Long, Long, Long)].collect()
    assert(got.length == 5000 * qs.length)
    got.foreach { case (pos, q, w) =>
      assert(w == SignLshSig.planeWeight(pos, q), s"pos=$pos q=$q")
    }
    // the family stays in {-3..3} and non-degenerate at large pos
    assert(got.map(_._3).toSet == Set(-3L, -2L, -1L, 0L, 1L, 2L, 3L))
  }
}
