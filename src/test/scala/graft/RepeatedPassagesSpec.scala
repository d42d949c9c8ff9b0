package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.TextPack

/** The r14 any-alignment repeated-passage detector (the Lee et al.
  * exact-substring-dedup reduction): it must catch a passage repeated
  * at ANY word offset — including those invisible to the 10-aligned
  * C4 span grid — merge overlapping duplicated windows into one
  * maximal region, and stay silent on unique text. r15: the suite runs
  * the REAL frame-parametric core (`TextPack.repeatedPassageRegions`,
  * the semi-join form) and pins it row-identical to the pre-r15
  * full-frequency-join form on randomized corpora.
  */
class RepeatedPassagesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    TextPack.repeatedPassageRegions(docs.toDF("doc_id", "text"))

  /** The pre-r15 frequency step: full window relation inner-joined to
    * the full per-hash count relation, filtered AFTER the join — the
    * reference for the semi-join rewrite's equivalence pin. */
  private def oldForm(docs: Seq[(Long, String)]): DataFrame = {
    val df = docs.toDF("doc_id", "text")
    val wins = df.select(col("doc_id"), posexplode(
        graft.functions.ShingleHash.shingle_hash60(col("text"), 8)))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("h"))
    val freq = wins.groupBy(col("h")).agg(count(lit(1)).as("c"))
    val dup = wins.join(freq, "h").filter(col("c") > 1L)
      .select(col("doc_id"), col("pos"))
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    dup
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(wnd) <= 7L, 0L).otherwise(1L))
      .withColumn("grp", sum(col("brk")).over(wnd))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("pos")).as("sp"),
        (max(col("pos")) - min(col("pos")) + lit(8L)).as("len_toks"))
  }

  private def uniq(tag: String, n: Int): String =
    (0 until n).map(i => s"${tag}$i").mkString(" ")

  test("catches a cross-alignment repeat the C4 grid misses") {
    // a 12-word passage shared by two docs at offsets 3 and 7: no
    // 10-aligned span boundary coincides, so qSpanDedup's grid sees
    // nothing, but the rolling windows match at every internal offset
    val passage = "the quick brown fox jumps over the lazy dog again and again"
    val d1 = s"${uniq("a", 3)} $passage ${uniq("b", 6)}"
    val d2 = s"${uniq("c", 7)} $passage ${uniq("d", 4)}"
    val got = run(Seq((1L, d1), (2L, d2))).collect()
    assert(got.length == 2, s"one region per doc: ${got.mkString(" ")}")
    // 12-word passage -> 5 duplicated windows -> merged region of 12
    assert(got.forall(_.getLong(3) == 12L), got.mkString(" "))
    val starts = got.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(starts(1L) == 3L && starts(2L) == 7L)
  }

  test("overlapping duplicated windows merge into ONE maximal region") {
    val passage = uniq("p", 20)
    val d1 = s"${uniq("x", 5)} $passage"
    val d2 = s"$passage ${uniq("y", 5)}"
    val regions = run(Seq((1L, d1), (2L, d2)))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n")).collect()
    assert(regions.forall(_.getLong(1) == 1L),
      s"expected one merged region per doc: ${regions.mkString(" ")}")
  }

  test("unique text yields no regions; within-doc repeats are found") {
    val selfRep = s"${uniq("s", 4)} one two three four five six seven eight " +
      s"${uniq("t", 4)} one two three four five six seven eight ${uniq("u", 4)}"
    val got = run(Seq((1L, uniq("z", 40)), (2L, selfRep))).collect()
    assert(got.forall(_.getLong(0) == 2L), "unique doc must be absent")
    assert(got.nonEmpty, "within-doc repeat must be detected")
  }

  test("semi-join form is row-identical to the full-frequency-join form") {
    // randomized corpora: seeded word soup over a small vocabulary so
    // repeats arise by collision, plus planted passages at odd offsets
    val rnd = new scala.util.Random(4177)
    val vocab = (0 until 30).map(i => s"w$i")
    def soup(n: Int): String =
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    for (trial <- 0 until 5) {
      val planted = soup(8 + rnd.nextInt(12))
      val docs = (0L until 24L).map { id =>
        val base = soup(20 + rnd.nextInt(40))
        val text =
          if (id % 3 == 0) {
            val words = base.split(" ")
            val cut = rnd.nextInt(words.length)
            (words.take(cut) ++ planted.split(" ") ++ words.drop(cut))
              .mkString(" ")
          } else base
        (id, text)
      }
      val a = run(docs).orderBy("doc_id", "grp").collect().toSeq
      val b = oldForm(docs).orderBy("doc_id", "grp").collect().toSeq
      assert(a == b, s"trial $trial diverged")
      assert(a.nonEmpty, s"trial $trial should contain planted repeats")
    }
  }
}
