package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by domain packs under `graft.queries`; each
  * pack pairs Spark DataFrame builders with DuckDB oracle SQL (same
  * column names, aligned types/rounding).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] =
    Seq(CorePack, EraPack, InfoPack, EventsPack, TextPack, SimilarityPack,
      MultimodalPack, MlPack, StatsPack, StreamPack, TrainPack)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The `spearman_rank` pipeline (`metrics.py:5-22`) — scan → per-era
    * pct-rank → rank-vs-truth correlation. */
  def entry(spark: SparkSession): DataFrame =
    CorePack.qSpearmanByEra(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
