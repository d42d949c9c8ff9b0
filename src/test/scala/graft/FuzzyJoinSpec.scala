package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

/** PASS-JOIN segment blocking must return EXACTLY the pairs within the
  * edit-distance threshold — the candidate set is a superset by the
  * pigeonhole argument, and verification trims it; equality against a
  * brute-force all-pairs levenshtein is the whole contract. */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vocab = Seq(
    "spark", "spork", "sparkle", "shark", "stark", "park", "parka",
    "quartz", "quart", "quarts", "zzz", "a", "ab", "abc",
    "holographic", "homographic", "chromatic", "chrome",
    "mississippi", "mississipi", "misisippi")

  private def brute(probe: Seq[String], build: Seq[String], tau: Int) =
    (for {
      p <- probe; b <- build
      d = {
        // classic DP
        val (m, n) = (p.length, b.length)
        val dp = Array.tabulate(m + 1)(i => Array.tabulate(n + 1)(j => 0))
        for (i <- 0 to m) dp(i)(0) = i
        for (j <- 0 to n) dp(0)(j) = j
        for (i <- 1 to m; j <- 1 to n)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + (if (p(i - 1) == b(j - 1)) 0 else 1))
        dp(m)(n)
      }
      if d <= tau
    } yield (p, b, d)).toSet

  test("tau=2: matches brute-force all-pairs exactly") {
    val probe = vocab.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("pk", "pstr")
    val build = vocab.zipWithIndex.map { case (s, i) => (1000L + i, s) }
      .toDF("bk", "bstr")
    val got = FuzzyJoin.editDistanceJoin(probe, "pstr", build, "bstr", tau = 2)
      .select(col("pstr"), col("bstr"), col("dist"))
      .as[(String, String, Int)].collect().toSet
    assert(got == brute(vocab, vocab, 2))
  }

  test("tau=1: matches brute-force, including identical strings at dist 0") {
    val probe = Seq("abcd", "abd", "xbcd", "wxyz").zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("pk", "pstr")
    val bs = Seq("abcd", "abcde", "bcd", "zzzz")
    val build = bs.zipWithIndex.map { case (s, i) => (9L + i, s) }.toDF("bk", "bstr")
    val got = FuzzyJoin.editDistanceJoin(probe, "pstr", build, "bstr", tau = 1)
      .select(col("pstr"), col("bstr"), col("dist"))
      .as[(String, String, Int)].collect().toSet
    assert(got == brute(Seq("abcd", "abd", "xbcd", "wxyz"), bs, 1))
  }

  test("dedup-then-broadcast census equals the per-row window form") {
    // the query computes best-match per dirty row over the DISTINCT
    // string domain (multiplicity guard); this must equal the direct
    // all-pairs + row_number(dist, ck) formulation on the real fixture,
    // whose 64-name vocabulary is exactly the high-multiplicity regime
    val d = TestSpark.sf
    val p = Tables.part(spark, d).select(col("p_partkey"), col("p_name"))
    val dirty = p.select(col("p_partkey").as("dk"),
      concat(
        expr("substring(p_name, 1, pmod(p_partkey, length(p_name) - 2) + 1)"),
        expr("substring(p_name, pmod(p_partkey, length(p_name) - 2) + 3, 1000)"))
        .as("dname"))
    val clean = p.select(col("p_partkey").as("ck"), col("p_name").as("cname"))
    val windowed = {
      val cand = dirty.crossJoin(clean)
        .withColumn("dist", levenshtein(col("dname"), col("cname"), 2))
        .filter(col("dist") >= 0 && col("dist") <= 2)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("dk")).orderBy(col("dist"), col("ck"))
      cand.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .groupBy(col("dist").cast("long").as("dist"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("ck") === col("dk"), 1L).otherwise(0L)).as("n_self"))
    }
    val got = graft.queries.CorePack.qFuzzyJoin(spark, d)
    assert(got.collect().toSeq.map(_.toSeq) ==
      windowed.orderBy(col("dist")).collect().toSeq.map(_.toSeq))
  }

  test("short and empty strings: matches brute-force (pigeonhole void below tau+1 chars)") {
    // builds of length <= tau have <= tau non-empty segments, so tau
    // edits can destroy all of them — these pairs must come from the
    // length-banded short path: "xy"~"ab" (dist 2), ""~"a" (dist 1),
    // ""~"" (dist 0), plus boundary lengths 3..5 against both regimes
    val shorts = Seq("", "a", "b", "ab", "xy", "abc", "abcd", "abcde", "spark")
    val probe = shorts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("pk", "pstr")
    val build = shorts.zipWithIndex.map { case (s, i) => (100L + i, s) }
      .toDF("bk", "bstr")
    val got = FuzzyJoin.editDistanceJoin(probe, "pstr", build, "bstr", tau = 2)
      .select(col("pstr"), col("bstr"), col("dist"))
      .as[(String, String, Int)].collect().toSet
    assert(got == brute(shorts, shorts, 2))
  }

  test("no duplicate pairs despite multi-segment matches") {
    // identical long strings match on all tau+1 segments; distinct()
    // must collapse them to one row
    val probe = Seq((1L, "holographic")).toDF("pk", "pstr")
    val build = Seq((2L, "holographic")).toDF("bk", "bstr")
    val got = FuzzyJoin.editDistanceJoin(probe, "pstr", build, "bstr", tau = 2)
    assert(got.count() == 1)
    assert(got.select("dist").as[Int].head() == 0)
  }
}
