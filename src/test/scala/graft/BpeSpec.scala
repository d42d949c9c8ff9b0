package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

/** The replace-chain BPE encode must BE the greedy merge-rank BPE: a
  * reference Scala implementation (apply merges in rank order,
  * left-to-right within the symbol sequence) is compared against the
  * column expression on the fixture vocabulary plus adversarial
  * synthetic words — the overlapping-pair case ([a a a] + merge(a,a)
  * → [aa, a], never [a, aa]) AND the symbol-boundary case the r17
  * review found (a longer symbol merely ENDING with the merge's left
  * side — "xa" + "b" under merge (a,b) must NOT become "xab"), which
  * the double-delimiter wrap exists to get right. */
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
    // "atco" rides along: a word whose greedy encode is [atc, o] —
    // under the old trailing-only terminators the (c,o) merge falsely
    // matched the tail of symbol "atc" and produced one token
    val words = vocab :+ "atco"
    val got = engineEncode(words, Bpe.Merges32)
    words.foreach { w =>
      val ref = referenceEncode(w, Bpe.Merges32)
      val (enc, n) = got(w)
      assert(enc == ref.map(";" + _ + ";").mkString(""), s"encode($w)")
      assert(n == ref.length, s"tokenCount($w): $n vs ${ref.length}")
    }
    assert(referenceEncode("atco", Bpe.Merges32) == Seq("atc", "o"))
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
      assert(got(w)._1 == ref.map(";" + _ + ";").mkString(""), s"encode($w)")
      assert(got(w)._2 == ref.length.toLong, s"count($w)")
    }
    // the canonical overlap: [a,a,a] must become [aa, a]
    assert(referenceEncode("aaa", merges) == Seq("aa", "a"))
    // and [a,a,a,a] must pair BOTH adjacent runs — [aa, aa]: under a
    // SHARED single delimiter the scan consumed the middle boundary
    // and could only reach [aa, a, a]; the double wrap keeps each
    // match self-contained
    assert(referenceEncode("aaaa", merges) == Seq("aa", "aa"))
  }

  test("a longer symbol ending with the merge's left side does not falsely merge") {
    // (x,a) builds symbol "xa"; the later (a,b) merge must see that
    // "xa" is not "a" — the boundary case the trailing-only
    // representation got wrong ("xa;b;" contains "a;b;")
    val merges = Seq(("x", "a"), ("a", "b"))
    val words = Seq("xab", "ab", "xaab", "axab", "xaxab")
    val got = engineEncode(words, merges)
    words.foreach { w =>
      val ref = referenceEncode(w, merges)
      assert(got(w)._1 == ref.map(";" + _ + ";").mkString(""), s"encode($w)")
      assert(got(w)._2 == ref.length.toLong, s"count($w)")
    }
    assert(referenceEncode("xab", merges) == Seq("xa", "b"))
  }
}
