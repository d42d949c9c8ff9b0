package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomFunctions
import graft.queries.{CorePack, TextPack}

/** Round-6 curation operators: bloom join pre-filter, RAG chunking,
  * span-level dedup, decontamination, language-mix rebalancing. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packBatches: batch assignment is shard-local") {
    val docs = Tables.documents(spark, TestSpark.sf)
    // packing a shard's docs alone equals that shard's slice of the
    // full packing: the cumsum window never crosses a (lang, shard)
    // boundary, so shard count only tunes parallelism
    val full = TextPack.packBatches(docs, nShards = 4L)
      .select("doc_id", "lang", "shard", "batch")
    val shardOf = pmod(graft.operators.TextOps.hash60(
      concat_ws("#", lit("pack"), col("doc_id"))), lit(4L))
    val alone = TextPack.packBatches(docs.filter(shardOf === 2L), nShards = 4L)
      .select("doc_id", "lang", "shard", "batch")
    val slice = full.filter(col("shard") === 2L)
    assert(alone.except(slice).count() == 0 && slice.except(alone).count() == 0)
    assert(slice.count() > 0)
  }

  test("packBatches: every batch respects the token budget (plus one doc overflow)") {
    // greedy streaming pack: a batch's pre-overflow content is < budget,
    // so total tokens < budget + its last doc's tokens; with budget
    // far above any single doc, batch totals stay under 2x budget
    val budget = 512L
    val batches = TextPack.packBatches(
      Tables.documents(spark, TestSpark.sf), nShards = 4L, budget = budget)
      .groupBy(col("lang"), col("shard"), col("batch"))
      .agg(sum(col("toks")).as("t"), max(col("toks")).as("mx"))
      .collect()
    assert(batches.nonEmpty)
    batches.foreach { r =>
      assert(r.getLong(3) < budget + r.getLong(4),
        s"batch ${r.mkString(",")} exceeds budget+last-doc bound")
    }
  }

  test("defaultPackShards floors at the oracle value and tracks parallelism") {
    assert(TextPack.defaultPackShards(spark) >= 8L)
  }

  test("packBatches session overload resolves the parallelism-relative shards") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val viaSession = TextPack.packBatches(spark, docs)
    val explicit = TextPack.packBatches(docs, TextPack.defaultPackShards(spark))
    assert(viaSession.except(explicit).isEmpty && explicit.except(viaSession).isEmpty)
    val maxShard = viaSession.agg(max(col("shard"))).head().getLong(0)
    assert(maxShard < TextPack.defaultPackShards(spark))
  }

  test("bloom prefilter never drops a true member (no false negatives)") {
    val keys = (1L to 500L).map(i => i * 7).toDF("k")
    val bf = BloomFunctions.buildKeyFilter(keys, "k", expectedItems = 1000L)
    val survivors = keys
      .filter(BloomFunctions.might_contain(bf, xxhash64(col("k"))))
      .count()
    assert(survivors == 500L) // every inserted key must probe true
  }

  test("bloom prefilter actually prunes non-members") {
    val keys = (1L to 100L).toDF("k")
    val bf = BloomFunctions.buildKeyFilter(keys, "k", expectedItems = 100L)
    val probes = (10_000L to 20_000L).toDF("k")
    val survivors = probes
      .filter(BloomFunctions.might_contain(bf, xxhash64(col("k"))))
      .count()
    // default FPP is ~3%; 10x headroom guards against flakiness
    assert(survivors < probes.count() / 3,
      s"bloom pruned almost nothing: $survivors of ${probes.count()}")
  }

  test("q_bloom_prefilter equals the plain semi-join plan") {
    val got = CorePack.qBloomPrefilter(spark, TestSpark.sf)
    val want = Tables.lineitem(spark, TestSpark.sf)
      .join(Tables.orders(spark, TestSpark.sf)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 0).as("sum_base"))
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("chunk windows cover every token exactly once per stride step") {
    val rows = TextPack.qChunkWindows(spark, TestSpark.sf).collect()
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (docId, chunks) =>
      val n = docs(docId)
      // chunk count = number of stride starts: floor((n-1)/15) + 1
      assert(chunks.length == ((n - 1) / 15 + 1),
        s"doc $docId: ${chunks.length} chunks for $n tokens")
      // every chunk is 1..20 tokens and the last one ends exactly at n
      val byId = chunks.sortBy(_.getLong(1))
      byId.foreach { c => assert(c.getLong(2) >= 1 && c.getLong(2) <= 20) }
      val last = byId.last
      assert(last.getLong(1) * 15 + last.getLong(2) == n)
    }
  }

  test("span dedup marks exactly the globally repeated spans") {
    // doc 1 and 2 share a 10-token span; doc 3 is unique; doc 4 repeats
    // its own span twice in-document
    val span = (1 to 10).map(i => s"w$i").mkString(" ")
    val uniq = (11 to 20).map(i => s"u$i").mkString(" ")
    val self = (21 to 30).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, span + " " + uniq),
      (2L, span + " " + (31 to 40).map(i => s"x$i").mkString(" ")),
      (3L, (41 to 50).map(i => s"y$i").mkString(" ")),
      (4L, self + " " + self)
    ).toDF("doc_id", "text")
    // run the same shape as qSpanDedup on the tiny frame
    val spans = df
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 10)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), floor(size(col("w")) / lit(10)).cast("int") - 1),
        i => graft.operators.TextOps.hash60(concat_ws(" ",
          slice(col("w"), i * lit(10) + 1, lit(10)))))).as("h"))
    val freq = spans.groupBy(col("h")).agg(count(lit(1)).as("c"))
    val out = spans.join(freq, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (2L, 1L)) // shared span dup, unique span kept
    assert(out(2L) == (2L, 1L))
    assert(out(3L) == (1L, 0L))
    assert(out(4L) == (2L, 2L)) // in-doc repeat counts as dup both times
  }

  test("decontamination flags exactly the docs sharing a benchmark 4-gram") {
    val out = TextPack.qDecontaminate(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no benchmark doc may appear in the output
    assert(out.keySet.forall(_ % 50 != 0))
    // brute-force witness on the same fixture
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").sliding(4)
        .filter(_.length == 4).map(_.mkString(" ")).toSet).toMap
    val benchGrams = docs.filter(_._1 % 50 == 0).values.flatten.toSet
    val expected = docs.filter { case (id, g) =>
      id % 50 != 0 && g.exists(benchGrams)
    }.map { case (id, g) => id -> g.count(benchGrams).toLong }
    assert(out == expected)
  }

  test("source cap keeps at most 15 docs per source, deterministically") {
    val out = TextPack.qSourceCap(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(out.nonEmpty)
    out.foreach { case (_, kept, _) => assert(kept <= 15) }
    // determinism: same id_sum on a second run
    val again = TextPack.qSourceCap(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(out.toSeq == again.toSeq)
  }

  test("source filter keeps exactly the docs of above-floor sources") {
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("source", "lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val keepSrc = docs.groupBy(_._1).filter { case (_, rows) =>
      rows.map(_._3).sum.toDouble / rows.length >= 290.0
    }.keySet
    val expected = docs.filter(r => keepSrc(r._1))
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = TextPack.qSourceFilter(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("funnel stages are monotonically shrinking and ordered in time") {
    val rows = graft.queries.EventsPack.qFunnel(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("1_signup", "2_click", "3_purchase"))
    assert(rows("1_signup") >= rows("2_click"))
    assert(rows("2_click") >= rows("3_purchase"))
    assert(rows("1_signup") > 0)
  }

  test("cohort retention: day-0 count equals cohort size and offsets stay within it") {
    val rows = graft.queries.EventsPack.qCohortRetention(spark, TestSpark.sf)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    val day0 = rows.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    // every user is active on their own first day
    val cohortSizes = Tables.events(spark, TestSpark.sf)
      .groupBy(col("user_id")).agg(to_date(min(col("ts"))).as("cohort"))
      .groupBy(col("cohort")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(day0 == cohortSizes)
    rows.foreach { case (cohort, _, n) => assert(n <= cohortSizes(cohort)) }
  }

  test("nearest centroid matches a driver-side brute force") {
    val emb = Tables.embeddings(spark, TestSpark.sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val cents = emb.groupBy(_._3).view.mapValues { vs =>
      val dim = vs.head._2.length
      val c = new Array[Double](dim)
      vs.foreach(v => (0 until dim).foreach(i => c(i) += v._2(i)))
      c.map(_ / vs.length)
    }.toMap
    val expected = emb.map { case (_, v, label) =>
      val pred = cents.toSeq.map { case (cl, c) =>
        (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, cl)
      }.min._2
      (label, pred)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = graft.queries.SimilarityPack.qNearestCentroid(spark, TestSpark.sf)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("quality cut drops each language's bottom quartile by rank") {
    val before = Tables.documents(spark, TestSpark.sf)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = TextPack.qQualityCut(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    after.foreach { case (lang, kept) =>
      val n = before(lang)
      // percent_rank >= 0.25 keeps exactly the ranks r (1-based) with
      // (r-1)/(n-1) >= 0.25 — pure integer arithmetic, no FP boundary
      val exact = (1L to n).count(r => (r - 1).toDouble / (n - 1) >= 0.25).toLong
      assert(kept == exact, s"$lang: kept=$kept exact=$exact (n=$n)")
    }
  }

  test("truncation caps tokens at 48 and hashes the truncated content") {
    val rows = TextPack.qTruncate(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == math.min(r.getLong(1), 48L))
    }
    // witness one long doc: hash must equal the hash of its 48-token prefix
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val long = rows.find(_.getLong(1) > 48).get
    val prefix = docs(long.getLong(0)).split(" ").take(48).mkString(" ")
    // same hash path as the query, no SQL-literal interpolation
    val h = spark.range(1)
      .select(graft.operators.TextOps.hash60(lit(prefix)).as("h"))
      .head().getLong(0)
    assert(long.getLong(3) == h)
  }

  test("rolling active users: WAU >= DAU and both bounded by user count") {
    val totalUsers = Tables.events(spark, TestSpark.sf)
      .select("user_id").distinct().count()
    val rows = graft.queries.EventsPack.qRollingActive(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (dau, wau, stick) =>
      assert(dau <= wau && wau <= totalUsers)
      assert(stick > 0.0 && stick <= 1.0)
    }
  }

  test("containment pairs really are shingle-subset pairs") {
    val pairs = TextPack.qContainment(spark, TestSpark.sf).collect()
    assert(pairs.nonEmpty)
    // brute-force witness on the raw trigram sets
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").sliding(3)
        .filter(_.length == 3).map(_.mkString(" ")).toSet).toMap
    pairs.foreach { r =>
      val (a, b) = (docs(r.getLong(0)), docs(r.getLong(1)))
      val smaller = if (a.size <= b.size) a else b
      val larger = if (a.size <= b.size) b else a
      assert(smaller.subsetOf(larger),
        s"pair (${r.getLong(0)},${r.getLong(1)}) is not a containment")
    }
  }

  test("token budget never exceeds 2000 per language and is greedy-prefix") {
    val rows = TextPack.qTokenBudget(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nKept, toksKept, used) =>
      assert(used <= 2000L && toksKept == used && nKept > 0)
    }
  }

  test("successive halving returns a ranked final rung of survivors") {
    val rows = graft.queries.MlPack.qSuccessiveHalving(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == 2)
    assert(rows(0)._1 == 1L && rows(1)._1 == 2L)
    assert(rows(0)._3 <= rows(1)._3) // leaderboard is rmse-ascending
    // survivors come from the deterministic grid
    val grid = (0 until 8).map(i => (i + 0.5) / 8.0).toSet
    rows.foreach { case (_, a, _) => assert(grid(a)) }
  }

  test("mix sample keeps the smallest language whole and rates are exact") {
    val counts = Tables.documents(spark, TestSpark.sf)
      .groupBy("lang").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minCnt = counts.values.min
    val out = TextPack.qMixSample(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    out.foreach { case (lang, kept, rate) =>
      assert(math.abs(rate - minCnt.toDouble / counts(lang)) < 1e-6)
      assert(kept <= counts(lang))
    }
    // the min language's rate is 1.0 -> every doc kept
    val minLang = counts.minBy(_._2)._1
    val keptMin = out.find(_._1 == minLang).get._2
    assert(keptMin == minCnt)
  }

  test("split leakage: cells partition the dedup pairs; leaked flags exactly the off-diagonal") {
    val cells = TextPack.qSplitLeakage(spark, TestSpark.sf)
      .as[(String, String, Long, Long, Int)].collect()
    assert(cells.nonEmpty)
    cells.foreach { case (lo, hi, n, _, leaked) =>
      assert(lo <= hi, s"cell ($lo, $hi) not canonical")
      assert(n > 0)
      assert((leaked == 1) == (lo != hi), s"leaked flag on ($lo, $hi)")
    }
    // the cells partition the >=0.5 near-dup pair set exactly
    val nPairs = TextPack.jaccardPairs(spark, TestSpark.sf, minJac = 0.5).count()
    assert(cells.map(_._3).sum == nPairs,
      s"cells cover ${cells.map(_._3).sum} pairs, pipeline has $nPairs")
    // and dedup-before-split leaves nothing to leak: dropping the
    // higher id of every pair (q_dedup_apply's rule) removes at least
    // one endpoint of every leaked pair by construction — the audit's
    // reason to exist is proving a corpus did this
    val dropped = TextPack.jaccardPairs(spark, TestSpark.sf, minJac = 0.5)
      .select(col("b")).distinct().as[Long].collect().toSet
    val leakedPairs = TextPack.jaccardPairs(spark, TestSpark.sf, minJac = 0.5)
      .as[(Long, Long, Double)].collect()
      .filter { case (a, b, _) => !dropped.contains(a) && !dropped.contains(b) }
    assert(leakedPairs.isEmpty, "dedup-applied corpus still has near-dup pairs")
  }
}
