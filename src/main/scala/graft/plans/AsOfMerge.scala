package graft.plans

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Physical-shaped as-of join: cogroup both sides on the key and run a
  * per-key sort-merge (the algorithm a custom `AsOfJoinExec
  * SparkPlan` would run per partition after hash distribution +
  * (key, time) ordering — expressed here through the typed
  * `KeyValueGroupedDataset.cogroup` API, which gives the same
  * distribution guarantees without a planner extension).
  *
  * Semantics are identical to `operators.AsOf.asOfJoin`: latest right
  * payload at-or-before the probe time, right rows winning ties;
  * equality of the two implementations is regression-tested
  * (`AsOfSpec`). Per-key groups must fit in task memory — true for
  * keyed time series (users, instruments); the window composition is
  * the fallback for monster keys.
  */
object AsOfMerge {

  /** Long-typed key/time/id/payload variant (epoch-micros times). */
  def asOfJoinMerge(left: DataFrame, right: DataFrame, key: String,
                    timeCol: String, idCol: String, payload: String): DataFrame = {
    val spark = left.sparkSession
    val outSchema = StructType(left.schema.fields :+
      StructField(s"${payload}_asof", LongType, nullable = true))
    val lidx = left.schema.fieldNames.zipWithIndex.toMap
    val ridx = right.schema.fieldNames.zipWithIndex.toMap
    val (lKey, lTime, lId) = (lidx(key), lidx(timeCol), lidx(idCol))
    val (rKey, rTime, rId, rPay) = (ridx(key), ridx(timeCol), ridx(idCol), ridx(payload))
    implicit val rowEnc = Encoders.row(outSchema)

    val lg = left.groupByKey(_.getLong(lKey))(Encoders.scalaLong)
    val rg = right.groupByKey(_.getLong(rKey))(Encoders.scalaLong)
    lg.cogroup(rg) { (_, ls: Iterator[Row], rs: Iterator[Row]) =>
      // refs sorted by (time, id); probe sorted the same way, then a
      // single forward merge — O(n log n) per key, no pair blow-up
      val refs = rs.map(r => (r.getLong(rTime), r.getLong(rId), r.getLong(rPay)))
        .toArray.sortBy(t => (t._1, t._2))
      val probes = ls.toArray.sortBy(r => (r.getLong(lTime), r.getLong(lId)))
      var ri = 0
      var current: java.lang.Long = null
      probes.iterator.map { row =>
        val t = row.getLong(lTime)
        while (ri < refs.length && refs(ri)._1 <= t) {
          current = refs(ri)._3; ri += 1
        }
        Row.fromSeq(row.toSeq :+ current)
      }
    }
  }
}
