package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{CorePack, EventsPack, SimilarityPack, TextPack}

/** Round-6 additions: SCD2 interval build, MERGE-style upsert,
  * per-user z-score anomalies, recency-decayed scoring, bigram PMI,
  * BM25 ranking, SemDeDup cluster dedup, corpus-audit queries. */
class WarehouseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scd2 intervals partition each user's events and close correctly") {
    val scd = EventsPack.qScd2(spark, TestSpark.sf).cache()
    val ev = Tables.events(spark, TestSpark.sf)
    // interval event counts sum back to the user's event total
    val fromScd = scd.groupBy("user_id").agg(sum("n_events").as("n"))
    val fromEv = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(fromScd.join(fromEv, Seq("user_id"))
      .filter(fromScd("n") =!= fromEv("n")).count() == 0)
    // exactly one open interval (valid_to null) per user — the current row
    val open = scd.filter(col("valid_to").isNull)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    assert(open.filter(col("n") =!= 1).count() == 0)
    // no two adjacent intervals share an event_type (else not collapsed)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ver"))
    val adj = scd.withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev") === col("event_type"))
    assert(adj.count() == 0)
    scd.unpersist()
  }

  test("upsert actions are consistent with the merged total") {
    val up = EventsPack.qUpsert(spark, TestSpark.sf).cache()
    // every user in the log appears exactly once in the merge output
    val users = Tables.events(spark, TestSpark.sf)
      .select(col("user_id")).distinct().count()
    assert(up.count() == users)
    assert(up.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    // merged totals equal the plain per-user sum (rounding-tolerant:
    // the merge rounds each leg before adding)
    val plain = Tables.events(spark, TestSpark.sf)
      .groupBy("user_id").agg(sum("value").as("total"))
    val drift = up.join(plain, "user_id")
      .filter(abs(col("merged_total") - col("total")) > 0.02)
    assert(drift.count() == 0)
    up.unpersist()
  }

  test("zscore anomaly counts match a brute-force per-user pass") {
    val got = EventsPack.qZscoreEvents(spark, TestSpark.sf)
      .select("user_id", "n_anomalies").as[(Long, Long)].collect().toMap
    val rows = Tables.events(spark, TestSpark.sf)
      .select("user_id", "value").as[(Long, Double)].collect()
    val brute = rows.groupBy(_._1).map { case (u, vs) =>
      val xs = vs.map(_._2)
      val m = xs.sum / xs.length
      val sd = if (xs.length < 2) 0.0
        else math.sqrt(xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
      u -> (if (sd == 0.0) 0L
        else xs.count(x => math.abs((x - m) / sd) > 2.0).toLong)
    }
    brute.foreach { case (u, n) => assert(got(u) == n, s"user $u") }
  }

  test("decay score matches a brute-force half-life computation") {
    val got = EventsPack.qDecayScore(spark, TestSpark.sf)
      .select("user_id", "decayed_score").as[(Long, Double)].collect().toMap
    val rows = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("ts").cast("long"), col("value"))
      .as[(Long, Long, Double)].collect()
    val ref = rows.map(_._2).max
    val brute = rows.groupBy(_._1).map { case (u, es) =>
      u -> es.map { case (_, t, v) =>
        v * math.pow(0.5, (ref - t) / 604800.0) }.sum
    }
    brute.foreach { case (u, s) =>
      assert(math.abs(got(u) - s) < 1e-3, s"user $u: ${got(u)} vs $s") }
  }

  test("bigram PMI agrees with a brute-force count over the corpus") {
    val top = TextPack.qBigramPmi(spark, TestSpark.sf)
      .select("bigram", "c_ab", "c_a", "c_b", "pmi")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(top.nonEmpty)
    val texts = Tables.documents(spark, TestSpark.sf)
      .select("text").as[String].collect()
    val uni = texts.flatMap(_.split(" ")).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bis = texts.flatMap(t => t.split(" ").sliding(2).filter(_.length == 2)
      .map(_.mkString(" ")).toSeq)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nU = uni.values.sum.toDouble
    val nB = bis.values.sum.toDouble
    top.foreach { case (bg, cab, ca, cb, pmi) =>
      assert(bis(bg) == cab, s"bigram count $bg")
      val Array(a, b) = bg.split(" ")
      assert(uni(a) == ca && uni(b) == cb, s"unigram counts $bg")
      val want = math.log(cab * nU * nU / (nB * ca * cb))
      assert(math.abs(pmi - want) < 1e-4, s"pmi $bg: $pmi vs $want")
    }
    // ordering: descending pmi
    assert(top.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("bm25 top docs match a brute-force scorer") {
    val got = TextPack.qBm25(spark, TestSpark.sf)
      .select("doc_id", "bm25").as[(Long, Double)].collect()
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val terms = Set("spark", "join", "window")
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.split(" ").length).sum / n
    val tf = docs.map { case (id, t) =>
      id -> t.split(" ").filter(terms).groupBy(identity).view.mapValues(_.length.toDouble).toMap }
    val df = terms.map(t => t -> tf.count(_._2.contains(t)).toDouble).toMap
    val scores = tf.collect { case (id, m) if m.nonEmpty =>
      val dl = docs.find(_._1 == id).get._2.split(" ").length.toDouble
      id -> m.map { case (t, f) =>
        math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1.0) * f * 2.2 /
          (f + 1.2 * (0.25 + 0.75 * dl / avgdl)) }.sum
    }.toMap
    got.foreach { case (id, s) =>
      assert(math.abs(scores(id) - s) < 1e-4, s"doc $id: $s vs ${scores(id)}") }
    // the returned set is the true top-|got| by (score desc, id)
    val wantTop = scores.toSeq
      .sortBy { case (id, s) =>
        (-BigDecimal(s).setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble, id) }
      .take(got.length).map(_._1).toSet
    assert(got.map(_._1).toSet == wantTop)
  }

  test("semdedup accounting: kept + dropped = total, and drops exist") {
    val sd = SimilarityPack.qSemdedup(spark, TestSpark.sf).cache()
    assert(sd.filter(col("n_kept") + col("n_dropped") =!= col("n_total")).count() == 0)
    val total = sd.agg(sum("n_total")).as[Long].head()
    assert(total == Tables.embeddings(spark, TestSpark.sf).count())
    sd.unpersist()
  }

  test("dup-rate audit: rate is zero iff all texts in a source are distinct") {
    val dr = TextPack.qDupBySource(spark, TestSpark.sf)
      .select("source", "n_docs", "n_uniq", "dup_rate")
      .as[(String, Long, Long, Double)].collect()
    dr.foreach { case (src, nd, nu, rate) =>
      assert(nu <= nd, src)
      assert((rate == 0.0) == (nd == nu), src)
    }
  }

  test("transition probabilities sum to 1 per source state") {
    val t = EventsPack.qTransitionCounts(spark, TestSpark.sf)
    val sums = t.groupBy("prev").agg(sum("p").as("sp"), sum("n").as("n"))
    assert(sums.filter(abs(col("sp") - 1.0) > 1e-4).count() == 0)
    // total transitions = total events minus one per user
    val nTrans = t.agg(sum("n")).as[Long].head()
    val ev = Tables.events(spark, TestSpark.sf)
    val want = ev.count() - ev.select("user_id").distinct().count()
    assert(nTrans == want)
  }

  test("conversion lag matches a brute-force first-signup/first-purchase pass") {
    val got = EventsPack.qConversionLag(spark, TestSpark.sf)
      .select("n_converted", "sum_lag_us").as[(Long, Long)].head()
    val rows = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect()
    val lags = rows.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val signups = es.filter(_._2 == "signup").map(_._3)
      if (signups.isEmpty) None
      else {
        val t0 = signups.min
        val ps = es.filter(e => e._2 == "purchase" && e._3 >= t0).map(_._3)
        if (ps.isEmpty) None else Some(ps.min - t0)
      }
    }
    assert(got._1 == lags.length)
    assert(got._2 == lags.sum) // exact integer micros, no tolerance needed
  }

  test("unigram entropy is bounded by ln(n_types) and matches brute force") {
    val e = TextPack.qUnigramEntropy(spark, TestSpark.sf)
      .select("lang", "n_types", "entropy").as[(String, Long, Double)].collect()
    e.foreach { case (lang, types, h) =>
      assert(h >= 0 && h <= math.log(types.toDouble) + 1e-9, lang) }
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("lang", "text").as[(String, String)].collect()
    val brute = docs.groupBy(_._1).map { case (lang, ds) =>
      val cs = ds.flatMap(_._2.split(" ")).groupBy(identity).values.map(_.size.toDouble)
      val n = cs.sum
      lang -> (math.log(n) - cs.map(c => c * math.log(c)).sum / n)
    }
    e.foreach { case (lang, _, h) =>
      assert(math.abs(h - brute(lang)) < 1e-4, lang) }
  }

  test("grouped regression matches closed-form least squares") {
    val got = TextPack.qRegrSlope(spark, TestSpark.sf)
      .select("lang", "slope", "intercept").as[(String, Double, Double)].collect()
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("lang"), col("n_chars").cast("double"),
        size(split(col("text"), " ")).cast("double"))
      .as[(String, Double, Double)].collect()
    val brute = docs.groupBy(_._1).map { case (lang, ds) =>
      val xs = ds.map(_._3); val ys = ds.map(_._2)
      val n = ds.length
      val mx = xs.sum / n; val my = ys.sum / n
      val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val sxx = xs.map(x => (x - mx) * (x - mx)).sum
      lang -> (sxy / sxx, my - sxy / sxx * mx)
    }
    got.foreach { case (lang, sl, ic) =>
      assert(math.abs(sl - brute(lang)._1) < 1e-3, s"$lang slope")
      assert(math.abs(ic - brute(lang)._2) < 1e-2, s"$lang intercept")
    }
  }

  test("gapfill: grid covers [min,max] per user, observed+filled=points, interpolation bounded") {
    val g = EventsPack.qGapfill(spark, TestSpark.sf).cache()
    assert(g.filter(col("n_observed") + col("n_filled") =!= col("n_points")).count() == 0)
    // grid length = span hours + 1
    val span = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("t"))
      .groupBy("user_id").agg((max("t") - min("t") + 1).as("expect"))
    assert(g.join(span, "user_id")
      .filter(col("n_points") =!= col("expect")).count() == 0)
    // every hour with an event is observed, so n_observed = distinct hours
    val hours = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("t"))
      .distinct().groupBy("user_id").agg(count(lit(1)).as("nh"))
    assert(g.join(hours, "user_id")
      .filter(col("n_observed") =!= col("nh")).count() == 0)
    g.unpersist()
  }

  test("linear interpolation is exact on a constructed gap") {
    import spark.implicits._
    val df = Seq((1L, 0L, 10.0), (1L, 4L, 30.0)).toDF("user_id", "t", "v")
    // reuse the same fill shape on a hand-made series: gap hours 1..3
    // must land on the 10→30 line (15, 20, 25)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("t"))
    val grid = df.groupBy(col("user_id"))
      .agg(min(col("t")).as("t0"), max(col("t")).as("t1"))
      .select(col("user_id"), explode(sequence(col("t0"), col("t1"))).as("t"))
    val filled = grid.join(df, Seq("user_id", "t"), "left_outer")
      .withColumn("p", last(when(col("v").isNotNull,
        struct(col("t").as("pt"), col("v").as("pv"))), ignoreNulls = true)
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .withColumn("nx", first(when(col("v").isNotNull,
        struct(col("t").as("nt"), col("v").as("nv"))), ignoreNulls = true)
        .over(w.rowsBetween(0, org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .withColumn("filled",
        when(col("v").isNotNull, col("v"))
          .otherwise(col("p.pv") + (col("nx.nv") - col("p.pv")) *
            (col("t") - col("p.pt")) / (col("nx.nt") - col("p.pt"))))
      .select("t", "filled").as[(Long, Double)].collect().toMap
    assert(filled(1L) == 15.0 && filled(2L) == 20.0 && filled(3L) == 25.0)
  }

  test("q5 local volume only counts same-nation customer/supplier pairs") {
    val got = CorePack.q5LocalVolume(spark, TestSpark.sf)
    // recompute with the predicate applied as a post-join filter
    val want = Tables.customer(spark, TestSpark.sf)
      .join(Tables.nation(spark, TestSpark.sf), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, TestSpark.sf), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .join(Tables.orders(spark, TestSpark.sf), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(spark, TestSpark.sf), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(spark, TestSpark.sf), col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 10000).cast("long")).as("revenue_e4"),
        count(lit(1)).as("n_items"))
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("winsorize: clip counts stay within the 5% tails and sum shrinks") {
    val w = graft.queries.StatsPack.qWinsorize(spark, TestSpark.sf)
      .select("l_returnflag", "n", "n_lo", "n_hi")
      .as[(String, Long, Long, Long)].collect()
    w.foreach { case (rf, n, lo, hi) =>
      // exact percentile guarantees at most ~5% strictly outside each bound
      assert(lo <= n * 0.05 + 1, s"$rf lo")
      assert(hi <= n * 0.05 + 1, s"$rf hi")
    }
  }

  test("chi2 matches a brute-force contingency computation") {
    val got = graft.queries.StatsPack.qChi2(spark, TestSpark.sf)
      .select("chi2", "dof", "n").as[(Double, Long, Long)].head()
    val rows = Tables.documents(spark, TestSpark.sf)
      .select("lang", "source").as[(String, String)].collect()
    val cells = rows.groupBy(identity).view.mapValues(_.length.toDouble).toMap
    val rt = rows.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val ct = rows.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val n = rows.length.toDouble
    // full lattice including empty cells (o = 0 still contributes e)
    val chi2 = (for (l <- rt.keys.toSeq; s <- ct.keys.toSeq) yield {
      val o = cells.getOrElse((l, s), 0.0)
      val e = rt(l) * ct(s) / n
      (o - e) * (o - e) / e
    }).sum
    assert(math.abs(got._1 - chi2) < 1e-3, s"${got._1} vs $chi2")
    assert(got._2 == (rt.size - 1).toLong * (ct.size - 1))
    assert(got._3 == rows.length)
  }

  test("streaming Welford stats drain to the batch aggregate") {
    val got = graft.queries.StreamPack.qStreamStats(spark, TestSpark.sf)
    val want = Tables.events(spark, TestSpark.sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total"),
        round(stddev_samp(col("value")), 4).as("std_value"))
      .select(col("user_id"), col("n_events"), col("total"), col("std_value"))
    assert(got.except(want).count() == 0 && want.except(got).count() == 0)
  }

  test("dq audit: violation counts match direct filters") {
    val a = CorePack.qDqAudit(spark, TestSpark.sf)
      .select("check_name", "n_checked", "n_violations")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val li = Tables.lineitem(spark, TestSpark.sf)
    assert(a("discount_range")._1 == li.count())
    assert(a("discount_range")._2 ==
      li.filter(!col("l_discount").between(0.0, 0.05)).count())
    assert(a("positive_price")._2 == 0)
    assert(a("fk_lineitem_orders")._2 == 0) // fixture is referentially intact
    assert(a.size == 5)
  }

  test("inverted index: df/cf/postings agree with a brute-force pass") {
    val got = TextPack.qInvertedIndex(spark, TestSpark.sf)
      .select("t", "df", "cf", "postings_head")
      .as[(String, Long, Long, String)].collect()
    val docs = Tables.documents(spark, TestSpark.sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val postings = docs.flatMap { case (id, t) =>
      t.split(" ").groupBy(identity).map { case (w, o) => (w, id, o.length.toLong) } }
    val byTerm = postings.groupBy(_._1)
    got.foreach { case (t, df, cf, head) =>
      val ps = byTerm(t)
      assert(df == ps.length, s"$t df")
      assert(cf == ps.map(_._3).sum, s"$t cf")
      val want = ps.map(_._2).sorted.take(20).mkString(",")
      assert(head == want, s"$t postings")
    }
    assert(got.length == byTerm.size)
  }

  test("psi is non-negative with at most 10 decile buckets") {
    val got = graft.queries.StatsPack.qPsi(spark, TestSpark.sf)
      .select("psi", "n_buckets").as[(Double, Long)].head()
    assert(got._2 <= 10 && got._2 >= 1)
    // each PSI term (pc-pr)*ln(pc/pr) is >= 0, so the sum is too
    assert(got._1 >= -1e-6, s"psi=${got._1}")
  }

  test("kl divergence per source is non-negative and zero only for identical mixes") {
    val kl = graft.queries.StatsPack.qKlSource(spark, TestSpark.sf)
      .select("source", "kl").as[(String, Double)].collect()
    // Gibbs' inequality: D(P||Q) >= 0 up to the 1e-5 rounding
    kl.foreach { case (src, v) => assert(v >= -1e-5, src) }
    assert(kl.length == 20)
  }

  test("event paths: every path is 3 states and counts are bounded by transitions") {
    val p = EventsPack.qEventPaths(spark, TestSpark.sf)
      .select("path", "n").as[(String, Long)].collect()
    assert(p.nonEmpty && p.length <= 20)
    p.foreach { case (path, n) =>
      assert(path.split(">").length == 3, path)
      assert(n >= 1)
    }
    // descending count order with path tie-break
    assert(p.sliding(2).forall(w => w.length < 2 ||
      w(0)._2 > w(1)._2 || (w(0)._2 == w(1)._2 && w(0)._1 < w(1)._1)))
  }

  test("lsh recall audit: hits bounded by both sides, banding theory holds") {
    val r = TextPack.qLshRecall(spark, TestSpark.sf)
      .select("n_true", "n_cand", "n_hit", "recall", "precision")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(r._3 <= math.min(r._1, r._2))
    assert(r._4 >= 0.0 && r._4 <= 1.0 && r._5 >= 0.0 && r._5 <= 1.0)
    // 8 bands x 2 rows: a >=0.5-Jaccard pair collides in some band
    // with probability 1-(1-s^2)^8 >= 0.90 — near-total recall is the
    // designed behavior, and the fixture should show it
    assert(r._4 >= 0.9, s"recall=${r._4}")
  }

  test("robust scale: scaled distribution respects median/IQR bounds") {
    val r = graft.queries.StatsPack.qRobustScale(spark, TestSpark.sf)
      .select("event_type", "n", "iqr", "n_outliers", "n_below_half_iqr")
      .as[(String, Long, Double, Long, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (et, n, iqr, outliers, below) =>
      assert(iqr > 0, et)
      // fewer than half the rows sit below median - IQR/2 (it is
      // strictly under the median), and Chebyshev-ish: |scaled| > 3
      // means 3 IQRs from the median — a small tail
      assert(below < n / 2.0, s"$et: $below of $n")
      assert(outliers < n / 4.0, s"$et outliers: $outliers of $n")
    }
  }

  test("dup-graph stats match a brute-force pass over the pair graph") {
    val g = TextPack.qDupGraphStats(spark, TestSpark.sf)
      .select("n_nodes", "n_edges", "max_degree", "n_triangles")
      .as[(Long, Long, Long, Long)].head()
    val edges = TextPack.jaccardPairs(spark, TestSpark.sf, minJac = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    assert(g._1 == nodes.size && g._2 == edges.size)
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).values.map(_.size).max
    assert(g._3 == deg)
    // nodes must be a Seq here: an inner Set generator dedupes the
    // yielded 1s, silently merging two triangles that share an edge
    val brute = (for {
      (a, b) <- edges.toSeq; c <- nodes.toSeq
      if b < c && edges((b, c)) && edges((a, c))
    } yield 1).size
    assert(g._4 == brute, s"triangles ${g._4} vs $brute")
  }

  test("attribution: attributed count never exceeds purchases; lag positive") {
    val a = EventsPack.qAttribution(spark, TestSpark.sf)
      .select("n_purchases", "n_attributed", "sum_lag_last_us")
      .as[(Long, Long, Option[Long])].collect()
    assert(a.nonEmpty)
    a.foreach { case (np, na, lag) =>
      assert(na <= np)
      lag.foreach(l => assert(l > 0))
    }
    // total purchases reconcile with the raw log
    val total = Tables.events(spark, TestSpark.sf)
      .filter(col("event_type") === "purchase").count()
    assert(a.map(_._1).sum == total)
  }

  test("pagerank: ranks sum to ~1 over the graph, all positive") {
    val e = TextPack.jaccardPairs(spark, TestSpark.sf, minJac = 0.5)
      .select("a", "b").as[(Long, Long)].collect()
    val nodes = e.flatMap(x => Seq(x._1, x._2)).distinct
    val pr = TextPack.qPagerank3(spark, TestSpark.sf)
      .select("v", "pr_e4").as[(Long, Double)].collect()
    assert(pr.forall(_._2 > 0))
    assert(pr.length == math.min(20, nodes.length))
    // brute-force 3 power iterations on the collected graph
    val deg = e.flatMap(x => Seq(x._1, x._2)).groupBy(identity).view
      .mapValues(_.length.toDouble).toMap
    val adj = (e ++ e.map(x => (x._2, x._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = nodes.length.toDouble
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to 3) {
      val in = nodes.map { v =>
        v -> adj.getOrElse(v, Array.empty[Long])
          .map(u => rank(u) / deg(u)).sum
      }.toMap
      rank = nodes.map(v => v -> (0.15 / n + 0.85 * in(v))).toMap
    }
    pr.foreach { case (v, got) =>
      assert(math.abs(got - rank(v) * 10000) < 1e-2, s"node $v") }
  }

  test("skew audit: shares and counts reconcile per key") {
    val a = CorePack.qSkewAudit(spark, TestSpark.sf)
      .select("key", "n_rows", "n_keys", "max_per_key", "top_share")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(a.length == 4)
    val rows = Tables.lineitem(spark, TestSpark.sf).count()
    a.foreach { case (k, n, keys, mx, share) =>
      assert(n == rows, k)
      assert(mx >= n / keys, k) // max >= mean
      assert(math.abs(share - mx.toDouble / n) < 1e-6, k)
    }
    // l_returnflag (3 values) must be flagged far more skewed than orderkey
    val m = a.map(x => x._1 -> x._5).toMap
    assert(m("l_returnflag") > m("l_orderkey") * 100)
  }

  test("quantile normalization: qn in [0,1], monotone with x across dims of the probe") {
    val q = SimilarityPack.qQuantileNorm(spark, TestSpark.sf)
      .select("pos", "x", "qn").as[(Long, Double, Double)].collect()
    assert(q.length == 64)
    q.foreach { case (p, _, qn) => assert(qn >= 0.0 && qn <= 1.0, p) }
    // brute force one dimension: qn = rank fraction of vec 0's RAW
    // value (the query's x column is rounded for display — comparing
    // against it flips neighbors within rounding distance)
    val xs = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), element_at(col("embedding"), 1).cast("double"))
      .as[(Long, Double)].collect()
    val raw0 = xs.find(_._1 == 0).get._2
    val below = xs.count(_._2 < raw0)
    val want = below.toDouble / (xs.length - 1)
    val got0 = q.find(_._1 == 0).get._3
    assert(math.abs(got0 - want) < 1e-4, s"$got0 vs $want")
  }

  test("ab test matches a brute-force Welch computation") {
    val got = EventsPack.qAbTest(spark, TestSpark.sf)
      .select("n_a", "n_b", "t_stat", "welch_df", "lift")
      .as[(Long, Long, Double, Double, Double)].head()
    val rows = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("value")).as[(Long, Double)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def grp(u: Long): Long = {
      val h = md.digest(s"ab#$u".getBytes("UTF-8"))
        .take(8).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(h, 16) % 2
    }
    val (g0, g1) = rows.partition(r => grp(r._1) == 0)
    def mv(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (m0, v0) = mv(g0.map(_._2)); val (m1, v1) = mv(g1.map(_._2))
    val n0 = g0.length.toDouble; val n1 = g1.length.toDouble
    assert(got._1 == g0.length && got._2 == g1.length)
    val se2 = v0 / n0 + v1 / n1
    assert(math.abs(got._3 - (m1 - m0) / math.sqrt(se2)) < 1e-3)
    val df = se2 * se2 /
      (v0 * v0 / (n0 * n0 * (n0 - 1)) + v1 * v1 / (n1 * n1 * (n1 - 1)))
    assert(math.abs(got._4 - df) < 0.1, s"${got._4} vs $df")
    assert(math.abs(got._5 - (m1 / m0 - 1.0)) < 1e-3)
  }

  test("length histogram buckets cover every doc exactly once") {
    val h = TextPack.qLengthHist(spark, TestSpark.sf)
    val n = h.agg(sum("n_docs")).as[Long].head()
    assert(n == Tables.documents(spark, TestSpark.sf).count())
    // bucket bounds consistent with the 50-char width
    val bad = h.filter(col("min_chars") < col("bucket") * 50 ||
      col("max_chars") >= (col("bucket") + 1) * 50)
    assert(bad.count() == 0)
  }
}
