package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M11 `fit_transform_dask` (`utils.py:132-167`): fit a transform on a
  * bounded head sample, then apply it to the full relation
  * distributed. The reference hand-chunks the transform across
  * workers with manual `num_splits`; in Spark the fitted parameters
  * become plan literals (driver → executors via the serialized plan —
  * the broadcast) and the transform is a codegen'd projection over
  * however many partitions the scan has.
  */
object Transform {

  /** Standardize `cols` using mean/stddev fit on the first `nFit` rows
    * ordered by `orderCol` (deterministic head, P4). Adds `<col>_z`
    * columns. */
  def standardizeOnHead(df: DataFrame, cols: Seq[String], nFit: Int,
                        orderCol: String): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(avg(col(c)).as(s"m_$c"), stddev_samp(col(c)).as(s"s_$c")))
    val stats = df.orderBy(col(orderCol)).limit(nFit)
      .agg(aggs.head, aggs.tail: _*).head()
    cols.foldLeft(df) { (acc, c) =>
      val m = stats.getAs[Double](s"m_$c")
      val s = stats.getAs[Double](s"s_$c")
      acc.withColumn(s"${c}_z", round((col(c) - m) / s, 4))
    }
  }
}
