package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextPack

/** Winnowing fingerprints (Schleimer et al. 2003): the published
  * guarantees — detection above the w+k−1 noise threshold, density,
  * window-local minimality — plus a brute-force replay. */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val k = 3
  private val w = 4

  private def winnow(rows: (Long, String)*) =
    TextPack.winnowFingerprints(rows.toDF("doc_id", "text"), k, w)

  /** Brute-force reference: positional k-gram 60-bit hashes, min per
    * window with rightmost tie, distinct (h, p). */
  private def reference(text: String): Set[(Long, Long)] = {
    val words = text.split(" ")
    val hs = words.sliding(k).map { g =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(g.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.take(15), 16)
    }.toArray
    val m = hs.length
    val nwin = math.max(m - (w - 1), 1)
    (1 to nwin).map { t =>
      val span = (t to math.min(t + w - 1, m))
      // min h, rightmost position on ties
      val best = span.minBy(i => (hs(i - 1), -i))
      (hs(best - 1), best.toLong)
    }.toSet
  }

  test("selection matches the brute-force reference on fixture docs") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .orderBy("doc_id").limit(20).collect()
    val got = TextPack.winnowFingerprints(
      Tables.documents(spark, TestSpark.sf), k, w)
      .filter(col("doc_id") <= docs.map(_._1).max)
      .select(col("doc_id"), explode(col("sel")).as("f"))
      .select(col("doc_id"), col("f.h"), col("f.p"))
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == reference(text), s"doc $id selection diverges")
    }
  }

  test("detection guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    // 200 randomized trials: two docs built from disjoint vocabularies
    // except for one shared run of exactly w+k-1 = 6 tokens planted at
    // random offsets — winnowing MUST select at least one common
    // fingerprint hash in every trial
    val rnd = new scala.util.Random(42)
    val trials = (0 until 200).map { i =>
      val run = Seq.fill(w + k - 1)(s"shared${i}_${rnd.nextInt(5)}")
      def filler(tag: String) =
        Seq.fill(rnd.nextInt(30) + 5)(s"$tag${rnd.nextInt(50)}")
      val a = (filler(s"a$i") ++ run ++ filler(s"a$i")).mkString(" ")
      val b = (filler(s"b$i") ++ run ++ filler(s"b$i")).mkString(" ")
      (i, a, b)
    }
    val docs = trials.flatMap { case (i, a, b) =>
      Seq((i * 2L, i.toLong, a), (i * 2L + 1L, i.toLong, b)) }
      .toDF("doc_id", "trial", "text")
    val sel = TextPack.winnowFingerprints(docs, k, w)
      .join(docs.select(col("doc_id"), col("trial")), "doc_id")
      .select(col("trial"), col("doc_id"), explode(col("sel")).as("f"))
      .select(col("trial"), col("doc_id"), col("f.h").as("h"))
    val shared = sel.groupBy("trial", "h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") === 2)
      .select("trial").distinct().count()
    assert(shared == 200L,
      s"only $shared/200 trials shared a fingerprint — guarantee broken")
  }

  test("density: n_fps bounded by [nwin/w, nwin] and near 2/(w+1) on average") {
    val r = TextPack.qWinnow(spark, TestSpark.sf).cache()
    val bad = r.filter(col("n_fps") > col("n_windows") ||
      col("n_fps") * w < col("n_windows")).count()
    assert(bad == 0, "a fingerprint covers at most w windows")
    val meanDensity = r.agg(avg(col("density"))).head().getDouble(0)
    assert(meanDensity > 0.25 && meanDensity < 0.6,
      s"mean density $meanDensity far from the published 2/(w+1) = 0.4")
    r.unpersist()
  }

  test("winnowPairs surfaces every pair sharing a long planted run") {
    // 20-token shared runs guarantee >= 2 shared fingerprints (the
    // pair threshold): 100 trials, each trial's two docs otherwise
    // drawn from disjoint vocabularies — all 100 pairs must surface,
    // and no cross-trial pair may appear
    val rnd = new scala.util.Random(7)
    val docs = (0 until 100).flatMap { i =>
      val run = Seq.fill(20)(s"run${i}_${rnd.nextInt(4)}")
      def filler(tag: String) =
        Seq.fill(rnd.nextInt(40) + 10)(s"$tag${rnd.nextInt(60)}")
      Seq((i * 2L, (filler(s"a$i") ++ run ++ filler(s"a$i")).mkString(" ")),
        (i * 2L + 1L, (filler(s"b$i") ++ run ++ filler(s"b$i")).mkString(" ")))
    }.toDF("doc_id", "text")
    val pairs = TextPack.winnowPairs(docs)
      .select(col("a"), col("b")).as[(Long, Long)].collect().toSet
    val expected = (0 until 100).map(i => (i * 2L, i * 2L + 1L)).toSet
    assert(expected.subsetOf(pairs),
      s"missed planted pairs: ${(expected -- pairs).take(5)}")
    assert(pairs == expected, s"spurious pairs: ${(pairs -- expected).take(5)}")
  }

  test("short docs: fewer grams than a window winnow the single truncated window") {
    val r = winnow((1L, "a b c"), (2L, "a b c d"), (3L, "a b"))
      .select(col("doc_id"), col("m"), col("nwin"), size(col("sel")).as("n"))
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1)
    // "a b c" = 1 gram -> 1 window, 1 fp; "a b c d" = 2 grams -> 1 window,
    // 1 fp; "a b" -> 0 grams, dropped
    assert(r.toSeq == Seq((1L, 1L, 1L, 1), (2L, 2L, 1L, 1)))
  }
}
