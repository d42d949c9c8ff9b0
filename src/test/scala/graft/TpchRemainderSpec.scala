package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorePack

/** Adversarial semantics for the round-8 TPC-H remainder shapes, on a
  * hand-built micro-fixture (parquet, through the production Tables
  * loaders). Every correlated / tie / boundary arm gets a row
  * engineered to trip it:
  *   - Q2: the REGION-scoped min (a cheaper out-of-region supplier
  *     must not win, and must not knock out the in-region minimum),
  *     plus an exact min tie emitting both suppliers;
  *   - Q13: a customer whose ONLY orders are excluded by the ON-clause
  *     predicate still appears with count 0 (the left-outer placement
  *     that distinguishes Q13 from a grouped count);
  *   - Q15: two suppliers tied at the max revenue both emit;
  *   - Q12: shipped EXACTLY orderdate+180 days is not late (strict >);
  *   - Q19: rows matching parts of one disjunct arm but failing that
  *     arm's size/quantity conjunct stay out.
  */
class TpchRemainderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_tpch_r8").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    Seq((0L, "ASIA"), (1L, "EUROPE"))
      .toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$d/region.parquet")
    Seq((0L, "N_A", 0L), (1L, "N_B", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$d/nation.parquet")
    Seq(
      (1L, "S1", 0L, 5000.0), // ASIA
      (2L, "S2", 0L, 5000.0), // ASIA
      (3L, "S3", 1L, 5000.0)  // EUROPE — cheaper on P1, must not win q2
    ).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$d/supplier.parquet")
    Seq(
      (1L, "P1", "Brand#1", "STANDARD", 9, 1.0),   // q2 subject
      (2L, "P2", "Brand#1", "STANDARD", 9, 1.0),   // q2 tie subject
      (3L, "P3", "Brand#3", "STANDARD", 20, 1.0),  // q19 arm 3: size 20 > 15
      (4L, "P4", "Brand#12", "STANDARD", 5, 1.0),  // q19 arm 1 match
      // q20 subject: name matches '%widget%'; size 3 keeps it out of
      // q2 (size 9) and Brand#9 out of every q19 arm
      (5L, "blue widget", "Brand#9", "STANDARD", 3, 1.0)
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    Seq(
      (100L, "C100", 0L, 100.0, "BUILDING"),
      (101L, "C101", 1L, 100.0, "AUTOMOBILE"),
      (102L, "C102", 0L, 100.0, "AUTOMOBILE") // orderless: q13 count 0
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    Seq(
      // kept by q13's <> '5-LOW'; late base for q12 (L1 ships 1997-02-01)
      (20L, 100L, "F", 10.0, ts("1996-06-01"), "1-URGENT"),
      // 1996-08-05 + 180d = 1997-02-01 EXACTLY -> L2 is not late
      (21L, 100L, "F", 10.0, ts("1996-08-05"), "5-LOW"),
      (22L, 101L, "F", 10.0, ts("1996-01-01"), "5-LOW"),
      // 1996-12-01 + 180d = 1997-05-30: L4-L6 (Feb) on time, L7 (June) late
      (23L, 101L, "F", 10.0, ts("1996-12-01"), "5-LOW")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val q1 = ts("1997-02-01")  // inside the q15 quarter
    Seq(
      // (orderkey, partkey, suppkey, ln, qty, extprice): unit cents =
      // extprice * 100 / qty
      (20L, 1L, 1L, 1, 5.0, 10.0, 0.0, 0.0, "N", "O", q1),           // P1@S1 200c
      (21L, 1L, 2L, 1, 5.0, 5.0, 0.0, 0.0, "N", "O", q1),            // P1@S2 100c: ASIA min
      (22L, 1L, 3L, 1, 5.0, 2.5, 0.0, 0.0, "N", "O", q1),            // P1@S3 50c: EUROPE
      (23L, 2L, 1L, 1, 5.0, 5.0, 0.0, 0.0, "N", "O", q1),            // P2@S1 100c: tie
      (23L, 2L, 2L, 2, 5.0, 5.0, 0.0, 0.0, "N", "O", q1),            // P2@S2 100c: tie
      (23L, 3L, 2L, 3, 25.0, 5.0, 0.0, 0.0, "N", "O", q1),           // q19 arm 3 qty ok, size not
      (23L, 4L, 3L, 4, 5.0, 7.0, 0.0, 0.0, "A", "O", ts("1997-06-01")), // q19 arm 1; q12 late low
      // q20 widget-part lines, April (outside q15's quarter, inside
      // q20's year, on time for q12: O23 + 180d = 1997-05-30):
      // S1 ships 30/40 = 75% (> 25%, dominant), S2 ships 10/40 = 25%
      // EXACTLY — 4·10 > 40 is false, the strict boundary excludes it
      (23L, 5L, 1L, 5, 30.0, 5.0, 0.0, 0.0, "N", "O", ts("1997-04-15")),
      (23L, 5L, 2L, 6, 10.0, 5.0, 0.0, 0.0, "N", "O", ts("1997-04-15"))
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("q2: region-scoped correlated min — out-of-region cheaper supplier neither wins nor vetoes; ties emit all") {
    val rows = CorePack.q2MinCost(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(4)))
    // P1: S3's 50c is out of region; the ASIA min is S2 at 100c.
    // P2: S1 and S2 tie at 100c -> both.
    assert(rows.toSeq == Seq((1L, "S2", 100L), (2L, "S1", 100L), (2L, "S2", 100L)),
      rows.mkString(";"))
  }

  test("q13: ON-clause exclusion keeps zero-order customers in the distribution") {
    val rows = CorePack.q13CustDistribution(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // C100 keeps 1 order (the urgent one); C101's orders are ALL
    // excluded and C102 has none -> two customers at count 0.
    assert(rows.toSeq == Seq((0L, 2L), (1L, 1L)), rows.mkString(";"))
  }

  test("q15: suppliers tied at max quarterly revenue all emit") {
    val rows = CorePack.q15TopSupplier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // S1 = 10+5, S2 = 5+5+5 -> both 15.00 (150000 e4); S3's June line
    // is outside the quarter.
    assert(rows.toSeq == Seq((1L, 150000L), (2L, 150000L)), rows.mkString(";"))
  }

  test("q12: exactly orderdate+180 days is on time; priority splits the late counts") {
    val rows = CorePack.q12LateLines(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // L1 (urgent order, 246d) -> N/high; L3 (5-LOW, 397d) -> N/low;
    // L7 (5-LOW, 182d) -> A/low; L2 at the exact boundary drops out.
    assert(rows.toSeq == Seq(("A", 0L, 1L), ("N", 1L, 1L)), rows.mkString(";"))
  }

  test("q20: >25% is dominant, exactly 25% is not (strict correlated-HAVING boundary)") {
    val rows = CorePack.q20DominantSupplier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    // S1 ships 75% of the widget part's annual volume; S2's exact 25%
    // fails the strict 4·sum > total; S3 ships none of it.
    assert(rows.toSeq == Seq((1L, "N_A")), rows.mkString(";"))
  }

  test("q19: a row matching an arm's brand but failing its size conjunct stays out") {
    val r = CorePack.q19DisjunctBrand(spark, dir).collect()(0)
    // Only L7 (Brand#12, size 5, qty 5) matches arm 1; L6's Brand#3
    // part is size 20 > 15 despite the in-range quantity.
    assert(r.getLong(0) == 70000L && r.getLong(1) == 1L, r)
  }
}
