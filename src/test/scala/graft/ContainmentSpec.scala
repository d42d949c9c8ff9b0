package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextPack

/** The r14 containment rewrite: the rarest-shingle anchor probe must
  * be row-identical to the exhaustive shingle self-join (the filter is
  * exact, not a recall dial — a contained set's rarest shingle is by
  * definition in the container), and it must catch the low-Jaccard
  * containment pairs a minhash/LSH prefilter would drop.
  */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("anchor-probe containment is row-identical to the exhaustive form") {
    val fast = TextPack.qContainment(spark, TestSpark.sf)
    val slow = TextPack.qContainmentExhaustive(spark, TestSpark.sf)
    assert(fast.count() == slow.count())
    assert(fast.except(slow).count() == 0)
    assert(slow.except(fast).count() == 0)
  }

  test("anchor probe catches a tiny-Jaccard containment pair") {
    import spark.implicits._
    // doc 1 is 5 distinct words (3 shingles), doc 2 embeds doc 1's text
    // inside ~200 unique words: Jaccard ~= 3/200 — far below any LSH
    // banding threshold — but containment is exactly 1.0, and doc 1's
    // rarest shingle (all of its shingles have df=2 here) still anchors
    // the pair. docs 3/4 are unrelated noise.
    val small = "aa bb cc dd ee"
    val filler = (0 until 200).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, small),
      (2L, s"$filler $small"),
      (3L, "xx yy zz qq rr ss tt"),
      (4L, "one two three four five six")
    ).toDF("doc_id", "text")
    val dsh = docs.select(col("doc_id"), explode(array_distinct(
      graft.functions.ShingleHash.shingle_hash60(col("text"), 3))).as("sh"))
    val dfc = dsh.groupBy(col("sh")).agg(count(lit(1)).as("graft_df"))
    val anchors = dsh.join(dfc, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(min_by(col("sh"), struct(col("graft_df"), col("sh"))).as("sh"))
    val cand = anchors.select(col("doc_id").as("u"), col("sh"))
      .join(dsh.select(col("doc_id").as("v"), col("sh")), Seq("sh"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b"))
      .distinct()
    val arrs = dsh.groupBy(col("doc_id"))
      .agg(collect_list(col("sh")).as("shs"), count(lit(1)).as("nsh"))
    val out = cand
      .join(arrs.select(col("doc_id").as("a"), col("shs").as("sh_a"),
        col("nsh").as("na")), Seq("a"))
      .join(arrs.select(col("doc_id").as("b"), col("shs").as("sh_b"),
        col("nsh").as("nb")), Seq("b"))
      .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast("long")
        === least(col("na"), col("nb")))
      .select(col("a"), col("b")).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L)
    // sanity: the pair's Jaccard really is below the usual 0.05 floor
    val jac = TextPack.jaccardPairsFrom(dsh, minJac = 0.0)
      .filter(col("a") === 1L && col("b") === 2L)
      .select(col("jacv")).head().getDouble(0)
    assert(jac < 0.05, s"engineered pair's Jaccard should be tiny, got $jac")
  }

  test("candidate volume is anchor-bounded, not df-squared") {
    import spark.implicits._
    // 50 docs sharing one moderately-hot shingle prefix: exhaustive
    // candidate generation emits ~50*49/2 pair-rows through that key;
    // the anchor probe emits at most one probe row per doc, each
    // fanning out only by its RAREST shingle's df (=1 here), so the
    // candidate set stays empty (no doc is contained in another).
    val docs = (0 until 50).map { i =>
      (i.toLong, s"common header here unique$i tail$i mark$i")
    }.toDF("doc_id", "text")
    val dsh = docs.select(col("doc_id"), explode(array_distinct(
      graft.functions.ShingleHash.shingle_hash60(col("text"), 3))).as("sh"))
    val dfc = dsh.groupBy(col("sh")).agg(count(lit(1)).as("graft_df"))
    val anchors = dsh.join(dfc, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(min_by(col("sh"), struct(col("graft_df"), col("sh"))).as("sh"))
    val cand = anchors.select(col("doc_id").as("u"), col("sh"))
      .join(dsh.select(col("doc_id").as("v"), col("sh")), Seq("sh"))
      .filter(col("u") =!= col("v"))
    // every doc's rarest shingle is unique to it -> zero candidates,
    // where the exhaustive self-join would have emitted 1225 pairs
    // through the shared header key alone
    assert(cand.count() == 0)
  }
}
