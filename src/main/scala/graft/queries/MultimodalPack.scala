package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Multimodal-column coverage: documents' text re-encoded as a binary
  * payload column, pushed through the batched decode-stub kernel
  * (`Multimodal.decodeBatch`) to a typed metadata relation.
  */
object MultimodalPack extends QueryPack {

  /** Binary payload → mapPartitions batch decode → metadata. The stub
    * metadata is pure arithmetic over payload bytes, so DuckDB can
    * recompute it — the oracle checks the whole binary-column path. */
  def qMultimodalMeta(s: SparkSession, d: String): DataFrame = {
    val payloads = Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    Multimodal.decodeBatch(payloads).toDF()
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_meta" -> qMultimodalMeta,
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | CAST(16 + octet_length(encode(text)) % 640 AS BIGINT) AS width,
        | CAST(16 + (octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
        | CAST(1 + ascii(substr(text, 1, 1)) % 8 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
