package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.CorePack

/** Adversarial semantics for the TPC-H plan-shape queries, on a
  * hand-built micro-fixture (written as parquet so the queries run
  * through the same Tables loaders as production): every inclusion /
  * exclusion arm of the correlated predicates is exercised by a row
  * engineered to trip it.
  */
class TpchShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_tpch_micro").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    Seq(
      (1L, "S1", 0L, 5000.0),
      (2L, "S2", 0L, 5000.0),
      (3L, "S3", 0L, 1000.0) // below the q16 balance floor
    ).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.mode("overwrite").parquet(s"$d/supplier.parquet")
    Seq(
      // O1: finished, multi-supplier, exactly one late supplier -> counts
      (10L, 100L, "F", 50.0, ts("1995-01-01"), "1-URGENT"),
      // O2: finished, multi-supplier, BOTH late -> NOT EXISTS kills it
      (11L, 100L, "F", 60.0, ts("1995-01-01"), "5-LOW"),
      // O3: open status -> excluded by o_orderstatus = 'F'
      (12L, 101L, "O", 70.0, ts("1995-01-01"), "5-LOW"),
      // O4: finished but single-supplier -> EXISTS kills it
      (13L, 101L, "F", 80.0, ts("1995-01-01"), "5-LOW")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val late = ts("1996-06-01")   // > 365 days after the order date
    val onTime = ts("1995-02-01")
    Seq(
      (10L, 1L, 1L, 1, 5.0, 10.0, 0.0, 0.0, "N", "O", late),
      (10L, 1L, 2L, 2, 5.0, 10.0, 0.0, 0.0, "N", "O", onTime),
      (11L, 1L, 1L, 1, 5.0, 10.0, 0.0, 0.0, "N", "O", late),
      (11L, 1L, 2L, 2, 5.0, 10.0, 0.0, 0.0, "N", "O", late),
      (12L, 1L, 3L, 1, 5.0, 10.0, 0.0, 0.0, "N", "O", late),
      (13L, 2L, 3L, 1, 200.0, 10.0, 0.0, 0.0, "N", "O", late)
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    Seq(
      (1L, "P1", "Brand#1", "t", 1, 1.0),
      (2L, "P2", "Brand#2", "t", 5, 1.0),
      (9L, "P9", "Brand#9", "t", 40, 1.0) // size outside the IN list
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    Seq(
      // above-avg balance, has an urgent order (cust 100 owns O1) -> excluded
      (100L, "C100", 0L, 9000.0, "BUILDING"),
      // above-avg balance, no urgent orders -> the one q22 survivor
      (101L, "C101", 1L, 8000.0, "AUTOMOBILE"),
      // below-avg balance, no urgent orders -> excluded by the scalar subquery
      (102L, "C102", 1L, 10.0, "AUTOMOBILE")
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    d
  }

  test("q21: counts exactly the sole late shipper of a finished multi-supplier order") {
    val rows = CorePack.q21SoleLate(spark, dir).collect()
    assert(rows.length == 1, rows.mkString(";"))
    assert(rows(0).getString(0) == "S1" && rows(0).getLong(1) == 1L)
  }

  test("q16: NOT IN drops the low-balance supplier; size list filters") {
    // P1 is shipped by S1, S2 (kept) and S3 (NOT-IN-excluded) -> 2
    // distinct suppliers; P2's ONLY supplier is the excluded S3, so
    // Brand#2 must vanish entirely; P9's size 40 is outside the IN
    // list
    val rows = CorePack.q16SupplierCnt(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(rows == Set(("Brand#1", 1, 2L)), rows)
  }

  test("q18: only orders whose TOTAL quantity crosses the having floor survive") {
    // O4 has one 200-qty line (> 150); every other order sums to 10
    val rows = CorePack.q18BigOrders(spark, dir).collect()
    assert(rows.length == 1, rows.mkString(";"))
    assert(rows(0).getLong(1) == 13L && rows(0).getLong(3) == 200L)
  }

  test("q22: above-average balance AND no urgent orders, per nation") {
    val rows = CorePack.q22IdleBalance(spark, dir).collect()
    assert(rows.length == 1, rows.mkString(";"))
    // nation 1, one customer (C101), balance 8000.00
    assert(rows(0).getLong(0) == 1L && rows(0).getLong(1) == 1L)
    assert(math.abs(rows(0).getDouble(2) - 8000.0) < 1e-9)
  }
}
