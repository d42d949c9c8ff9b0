package graft.operators

import org.apache.spark.sql.DataFrame

/** Write-side co-location (SURVEY §4 / SCALE.md joins row): bucket
  * both sides of a repeated fact-fact join by the join key so the
  * sort-merge join needs no shuffle exchange at read time. At 100 TB
  * this converts the orders⋈lineitem exchange (the one unavoidable
  * big shuffle in the star battery) into a one-time write-side cost
  * amortized over every downstream join.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
