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

  private def payloads(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Resize kernel: every-2nd-byte downsample, metadata measured from
    * the actual resized buffer (the transform-then-measure path). */
  def qMediaResize(s: SparkSession, d: String): DataFrame =
    Multimodal.resizeBatch(payloads(s, d), factor = 2).toDF()
      .orderBy(col("doc_id"))

  /** Frame sampling: every-2nd-frame flatMap explosion with per-frame
    * seek offsets and signatures. */
  def qFrameSample(s: SparkSession, d: String): DataFrame =
    Multimodal.frameSampleBatch(payloads(s, d), stride = 2).toDF()
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Feature extraction: decoded-buffer character-class counts (the
    * embedding-model stand-in). */
  def qMediaFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.extractFeaturesBatch(payloads(s, d)).toDF()
      .orderBy(col("doc_id"))

  val queries: Map[String, Q] = Map(
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_media_resize"    -> qMediaResize,
    "q_frame_sample"    -> qFrameSample,
    "q_media_features"  -> qMediaFeatures,
  )

  val oracles: Map[String, String] = Map(
    // `fb` is the first UTF-8 BYTE of the payload (what the kernel
    // reads), derived from the first codepoint via the UTF-8
    // leading-byte formula — ascii() alone would diverge on any doc
    // starting with a non-ASCII char (e.g. CJK text)
    "q_multimodal_meta" ->
      """WITH m AS (SELECT doc_id, text, ascii(substr(text, 1, 1)) AS cp
        |           FROM documents),
        |fbm AS (SELECT doc_id, text,
        |    CASE WHEN cp < 128 THEN cp
        |         WHEN cp < 2048 THEN 192 + cp // 64
        |         WHEN cp < 65536 THEN 224 + cp // 4096
        |         ELSE 240 + cp // 262144 END AS fb
        |  FROM m)
        |SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | CAST(16 + octet_length(encode(text)) % 640 AS BIGINT) AS width,
        | CAST(16 + (octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
        | CAST(1 + fb % 8 AS BIGINT) AS n_frames
        |FROM fbm ORDER BY doc_id""".stripMargin,
    "q_media_resize" ->
      """SELECT doc_id,
        | CAST((octet_length(encode(text)) + 1) // 2 AS BIGINT) AS out_len,
        | CAST(16 + ((octet_length(encode(text)) + 1) // 2) % 320 AS BIGINT) AS out_width,
        | CAST(16 + (((octet_length(encode(text)) + 1) // 2) * 5) % 240 AS BIGINT) AS out_height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_frame_sample" ->
      """WITH cpm AS (SELECT doc_id, text, ascii(substr(text, 1, 1)) AS cp
        |             FROM documents),
        |fbm AS (SELECT doc_id, text,
        |    CASE WHEN cp < 128 THEN cp
        |         WHEN cp < 2048 THEN 192 + cp // 64
        |         WHEN cp < 65536 THEN 224 + cp // 4096
        |         ELSE 240 + cp // 262144 END AS fb
        |  FROM cpm),
        |m AS (SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |    CAST(1 + fb % 8 AS BIGINT) AS n_frames,
        |    CAST(fb AS BIGINT) AS first
        |  FROM fbm)
        |SELECT doc_id, CAST(idx AS BIGINT) AS frame_idx,
        | CAST(idx * byte_len // n_frames AS BIGINT) AS frame_off,
        | CAST((first * 31 + idx * 7) % 256 AS BIGINT) AS frame_sig
        |FROM m, unnest(generate_series(0, n_frames - 1)) AS t(idx)
        |WHERE idx % 2 = 0 ORDER BY doc_id, frame_idx""".stripMargin,
    "q_media_features" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT) AS n_alpha,
        | CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS n_digit,
        | CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_space,
        | CAST(length(text)
        |   - length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
        |   - length(regexp_replace(text, '[^0-9]', '', 'g'))
        |   - (length(text) - length(replace(text, ' ', ''))) AS BIGINT) AS n_other
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
