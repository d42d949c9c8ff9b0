package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MergeOps

/** Row-level MERGE semantics: replacement (nulls included), insert,
  * delete, idempotence, and the duplicate-change-key misuse signal. */
class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def target = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "tag", "v")

  test("upsert replaces matched rows entirely (null fields win) and inserts the rest") {
    val updates = Seq(
      (2L, null.asInstanceOf[String], 99.0), // replace, null tag wins
      (4L, "d", 40.0)                        // insert
    ).toDF("k", "tag", "v")
    val got = MergeOps.upsert(target, updates, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq(
      (1L, "a", 10.0), (2L, null, 99.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("applyChanges deletes marked keys, no-ops absent keys, and is idempotent") {
    val changes = Seq(
      (3L, "x", 0.0, "D"),   // delete
      (9L, "x", 0.0, "D"),   // absent key: no-op
      (1L, "a2", 11.0, "U"), // replace
      (5L, "e", 50.0, "U")   // insert
    ).toDF("k", "tag", "v", "op")
    val once = MergeOps.applyChanges(target, changes, "k")
    val twice = MergeOps.applyChanges(once, changes, "k")
    val want = Seq((1L, "a2", 11.0), (2L, "b", 20.0), (5L, "e", 50.0))
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(snap(once) == want)
    assert(snap(twice) == want)
  }

  test("duplicate change keys fan out — the observable cardinality-violation signal") {
    val dup = Seq((2L, "p", 1.0), (2L, "q", 2.0)).toDF("k", "tag", "v")
    assert(MergeOps.upsert(target, dup, "k").filter(col("k") === 2L).count() == 2L)
  }

  test("diff round-trips: applyChanges(prev, diff(prev, next)) == next") {
    val prev = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("k", "tag", "v")
    val next = Seq(
      (1L, "a", 10.0),              // unchanged
      (2L, "b2", 20.0),             // updated field
      (4L, null.asInstanceOf[String], 40.0), // updated to null
      (5L, "e", 50.0)               // inserted; 3 deleted
    ).toDF("k", "tag", "v")
    val d = MergeOps.diff(prev, next, "k")
    val ops = d.select("k", "op").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // minimal: unchanged key 1 emits nothing
    assert(ops == Set((2L, "U"), (3L, "D"), (4L, "U"), (5L, "I")))
    val rt = MergeOps.applyChanges(prev, d, "k")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val want = next.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rt == want)
    // diff of identical snapshots is empty
    assert(MergeOps.diff(next, next, "k").isEmpty)
  }

  test("upsert on key-bucketed tables plans with no shuffle exchange") {
    // SCALE.md's merge claim: the full-outer upsert join is co-located
    // when both sides are bucketed on the merge key — the CDC shape
    // that makes repeated 100 TB applies shuffle-free
    val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
      .toDF("k", "v")
    val upd = Seq((2L, 99.0), (5L, 50.0)).toDF("k", "v")
    Seq("graft_merge_t", "graft_merge_u").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete(); ()
        }
        rm(loc)
      }
    }
    graft.operators.Bucketing.writeBucketed(base, "graft_merge_t", "k", 4)
    graft.operators.Bucketing.writeBucketed(upd, "graft_merge_u", "k", 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val merged = MergeOps.upsert(
        spark.table("graft_merge_t"), spark.table("graft_merge_u"), "k")
      val plan = merged.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(1500))
      val got = merged.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == Seq((1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 40.0), (5L, 50.0)))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("reserved '__' columns are rejected, not silently corrupted") {
    // '__upd' is one of the fabricated helper names: an input carrying
    // it would collide with the merge internals
    val poisoned = Seq((1L, "a", true)).toDF("k", "tag", "__upd")
    val p2 = Seq((2L, "b", false)).toDF("k", "tag", "__upd")
    val e1 = intercept[IllegalArgumentException](
      MergeOps.upsert(poisoned, p2, "k"))
    assert(e1.getMessage.contains("__upd"))
    val e2 = intercept[IllegalArgumentException](
      MergeOps.diff(poisoned, p2, "k"))
    assert(e2.getMessage.contains("reserved"))
  }

  test("upsert rejects mismatched schemas") {
    val bad = Seq((1L, "a")).toDF("k", "tag")
    val e = intercept[IllegalArgumentException] {
      MergeOps.upsert(target, bad, "k")
    }
    assert(e.getMessage.contains("column mismatch"))
  }
}
