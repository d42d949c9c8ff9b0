package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

/** The replace-chain BPE encode must BE the greedy merge-rank BPE: a
  * reference Scala implementation (apply merges in rank order,
  * left-to-right within the symbol sequence) is compared against the
  * column expression on the fixture vocabulary plus adversarial
  * synthetic words — in particular the overlapping-pair case
  * ([a a a] + merge(a,a) → [aa, a], never [a, aa]) that the
  * terminator-delimited representation exists to get right. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def referenceEncode(word: String,
                              merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString).toList
    merges.foreach { case (a, b) =>
      val out = scala.collection.mutable.ListBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toList
    }
    syms
  }

  private def engineEncode(words: Seq[String],
                           merges: Seq[(String, String)]): Map[String, (String, Long)] =
    words.toDF("w")
      .select(col("w"), Bpe.encode(col("w"), merges).as("enc"),
        Bpe.tokenCount(col("w"), merges).as("n"))
      .as[(String, String, Long)].collect()
      .map { case (w, e, n) => (w, (e, n)) }.toMap

  test("engine encode equals the reference greedy BPE on the fixture vocabulary") {
    val vocab = Tables.documents(spark, TestSpark.sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect().toSeq
    assert(vocab.nonEmpty)
    val got = engineEncode(vocab, Bpe.Merges32)
    vocab.foreach { w =>
      val ref = referenceEncode(w, Bpe.Merges32)
      val (enc, n) = got(w)
      assert(enc == ref.map(_ + ";").mkString(""), s"encode($w)")
      assert(n == ref.length, s"tokenCount($w): $n vs ${ref.length}")
    }
    // fixture-fit guard: the pinned table must stay genuinely
    // sub-word on the fixture (the saturation-degenerate outcome the
    // provenance tool records would make this op whitespace counting)
    val whole = vocab.count(w => referenceEncode(w, Bpe.Merges32).length == 1)
    assert(whole < vocab.length / 2,
      s"pinned merges near-saturate the fixture vocab ($whole/${vocab.length})")
  }

  test("overlapping pairs merge left-to-right; synthetic edge words agree with the reference") {
    val merges = Seq(("a", "a"), ("aa", "b"), ("c", "d"))
    val words = Seq("aaa", "aaaa", "aaab", "abab", "cdcd", "x", "cda", "aabaa")
    val got = engineEncode(words, merges)
    words.foreach { w =>
      val ref = referenceEncode(w, merges)
      assert(got(w)._1 == ref.map(_ + ";").mkString(""), s"encode($w)")
      assert(got(w)._2 == ref.length.toLong, s"count($w)")
    }
    // the canonical overlap: [a,a,a] must become [aa, a]
    assert(referenceEncode("aaa", merges) == Seq("aa", "a"))
  }
}
