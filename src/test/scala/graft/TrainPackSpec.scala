package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TrainPack

/** Training-data output surface: temperature mix, shuffle-shard,
  * shingle novelty (the DuckDB oracles pin exact values; these pin
  * the semantic invariants that make the values RIGHT). */
class TrainPackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("temperature mix: weights sum to 1 and alpha<1 boosts rare languages") {
    val rows = TrainPack.qMixTemperature(spark, TestSpark.sf)
      .as[(String, Long, Double, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "weights must sum to 1")
    rows.foreach { case (lang, nDocs, _, target, nKept, _) =>
      assert(nKept == math.min(target, nDocs),
        s"$lang: kept $nKept != min(target=$target, inventory=$nDocs)")
    }
    // p(L) ∝ n^0.7 upsamples rare languages: the smallest language's
    // kept FRACTION must be >= the largest's (strictly, unless both
    // saturate)
    val smallest = rows.minBy(_._2)
    val largest = rows.maxBy(_._2)
    assert(smallest._2 < largest._2, "fixture should have skewed languages")
    val fSmall = smallest._5.toDouble / smallest._2
    val fLarge = largest._5.toDouble / largest._2
    assert(fSmall >= fLarge,
      s"temperature inverted: rare kept $fSmall < common kept $fLarge")
  }

  test("shuffle-shard: partition of the corpus; order is hash-determined, not ingest") {
    val rows = TrainPack.qTrainShard(spark, TestSpark.sf)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(rows.map(_._1).toSet == (0L until 8L).toSet)
    val docs = Tables.documents(spark, TestSpark.sf)
      .agg(count(lit(1)), sum(col("doc_id"))).as[(Long, Long)].head()
    assert(rows.map(_._2).sum == docs._1, "shards must partition the corpus")
    assert(rows.map(_._4).sum == docs._2, "id checksum must cover every doc")
    rows.foreach { case (sh, n, _, _, head3) =>
      assert(head3.split(",").length == math.min(3, n).toInt, s"shard $sh head")
    }
    // the permutation decorrelates ingest order: no shard's head is
    // simply the 3 smallest doc ids it contains (astronomically
    // unlikely under a real hash order, certain under ingest order)
    val byIngest = rows.count { case (_, _, _, _, h) =>
      val ids = h.split(",").map(_.toLong); ids.sameElements(ids.sorted) }
    assert(byIngest < rows.length, "every shard head in ingest order — not shuffled")
  }

  test("export macro: deduped, mix-sized, fully sharded — consistent with its stages") {
    val exp = TrainPack.qTrainExport(spark, TestSpark.sf)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(exp.nonEmpty)
    // selected total equals the sum of per-language min(target, deduped
    // inventory) — the mix stage's own contract applied after dedup
    val docs = Tables.documents(spark, TestSpark.sf)
    val dedupCnt = docs.groupBy(sha2(col("text"), 256))
      .agg(min(col("doc_id")).as("doc_id"))
      .join(docs, "doc_id").groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    val total = dedupCnt.values.sum
    val z = dedupCnt.values.map(n => math.pow(n.toDouble, 0.7)).sum
    // mirror the engine's round-before-floor boundary rule (r17): the
    // raw product snaps to the 1e-6 grid before floor on both engines
    def target(n: Long): Long = math.floor(BigDecimal(
      math.pow(n.toDouble, 0.7) / z * (total / 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong
    val want = dedupCnt.map { case (_, n) => math.min(target(n), n) }.sum
    assert(exp.map(_._3).sum == want,
      s"selected ${exp.map(_._3).sum} != per-language mix quota sum $want")
    // every emitted shard id is in range; per-(shard, lang) rows unique
    assert(exp.forall(r => r._1 >= 0 && r._1 < 8))
    assert(exp.map(r => (r._1, r._2)).distinct.length == exp.length)
  }

  test("novelty: first doc is all-novel, ratios bounded, novel counts cover the shingle universe") {
    val rows = TrainPack.qShingleNovelty(spark, TestSpark.sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, nov, r) =>
      assert(nov >= 0 && nov <= n && r >= 0.0 && r <= 1.0, s"doc $id bounds")
    }
    val first = rows.minBy(_._1)
    assert(first._4 == 1.0, "the earliest doc's shingles are all first occurrences")
    // every distinct corpus shingle is novel in exactly one doc
    val universe = Tables.documents(spark, TestSpark.sf)
      .select(explode(array_distinct(
        graft.functions.ShingleHash.shingle_hash60(col("text"), 3))).as("sh"))
      .agg(countDistinct(col("sh"))).as[Long].head()
    assert(rows.map(_._3).sum == universe,
      "sum of per-doc novel counts must equal the distinct shingle universe")
  }

  test("novelty via the shared repeated-shingle index equals the inline min-agg form") {
    // r17 rewired qShingleNovelty to read first-occurrence facts from
    // TextPack.sharedShingleDf (df>1 rows only; absent ⇒ df=1 ⇒ novel)
    // instead of re-shuffling the corpus tokens per query — this pins
    // that the rewrite is a pure plan change, not a semantic one
    val viaIndex = TrainPack.qShingleNovelty(spark, TestSpark.sf)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    val dsh = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.ShingleHash.shingle_hash60(col("text"), 3))).as("sh"))
    val first = dsh.groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
    val inline = dsh.join(first, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        round(col("n_novel") / col("n_shingles"), 6).as("novelty"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(viaIndex.sameElements(inline),
      "shared-index novelty diverged from the inline min-agg form")
  }

  test("fertility: per-language sums reconcile with the per-doc BPE accounting") {
    // q_bpe_fertility and q_bpe_tokens share the pinned merge table;
    // grouping the per-doc rows by language must reproduce the
    // fertility relation's integer sums exactly
    val fert = TrainPack.qBpeFertility(spark, TestSpark.sf)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => (r._1, (r._2, r._3))).toMap
    val perDoc = TrainPack.qBpeTokens(spark, TestSpark.sf)
      .join(Tables.documents(spark, TestSpark.sf).select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(sum(col("n_words")).as("w"), sum(col("bpe_tokens")).as("t"))
      .as[(String, Long, Long)].collect()
    assert(perDoc.nonEmpty && perDoc.length == fert.size)
    perDoc.foreach { case (lang, w, t) =>
      assert(fert(lang) == ((w, t)), s"$lang: per-doc rollup ($w,$t) vs ${fert(lang)}")
    }
    // fertility must be genuinely sub-word under the pinned artifact
    fert.values.foreach { case (w, t) => assert(t > w, "merges saturated to words") }
  }
}
