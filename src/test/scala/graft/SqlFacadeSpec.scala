package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CorePack

/** Pins the SQL-facade placeholder splice (prefix-table hazard) and
  * the Q4 semi-join semantics on a hand-built micro-fixture.
  */
class SqlFacadeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rewritePlaceholders: part next to partsupp corrupts in neither fold order") {
    val sql = "SELECT * FROM graft_partsupp ps JOIN graft_part p " +
      "ON ps.ps_partkey = p.p_partkey WHERE graft_part.p_size > 0"
    val want = "SELECT * FROM graft_partsupp_ab ps JOIN graft_part_ab p " +
      "ON ps.ps_partkey = p.p_partkey WHERE graft_part_ab.p_size > 0"
    assert(CorePack.rewritePlaceholders(sql, Seq("part", "partsupp"), "ab") == want)
    assert(CorePack.rewritePlaceholders(sql, Seq("partsupp", "part"), "ab") == want)
  }

  test("rewritePlaceholders: ignores column-ish tokens touching the placeholder") {
    // an identifier CONTAINING the placeholder must survive untouched
    val sql = "SELECT graft_partx, xgraft_part FROM graft_part"
    assert(CorePack.rewritePlaceholders(sql, Seq("part"), "cd") ==
      "SELECT graft_partx, xgraft_part FROM graft_part_cd")
  }

  private lazy val q4Dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_q4_micro").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    Seq(
      // in window, one late line -> counted
      (1L, 10L, "F", 10.0, ts("1996-02-01"), "1-URGENT"),
      // in window, TWO late lines -> still counted exactly once (semi join)
      (2L, 10L, "F", 10.0, ts("1996-02-01"), "1-URGENT"),
      // in window, only on-time lines -> excluded
      (3L, 10L, "F", 10.0, ts("1996-03-01"), "2-HIGH"),
      // outside window, late line -> excluded
      (4L, 10L, "F", 10.0, ts("1995-06-01"), "2-HIGH"),
      // boundary: shipped exactly 30 days after order date is NOT late
      (5L, 10L, "F", 10.0, ts("1996-02-01"), "3-MEDIUM")
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    def li(ok: Long, ship: String) =
      (ok, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ts(ship))
    Seq(
      li(1L, "1996-04-01"), li(1L, "1996-02-02"),
      li(2L, "1996-04-01"), li(2L, "1996-05-01"),
      li(3L, "1996-03-02"),
      li(4L, "1996-06-01"),
      li(5L, "1996-03-02") // o_orderdate + exactly 30 days
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("q4: EXISTS counts each qualifying order once; window and boundary hold") {
    val rows = CorePack.q4OrderPriority(spark, q4Dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows == Map("1-URGENT" -> 2L), rows)
  }
}
