package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star): media payloads are opaque
  * `binary` columns with typed metadata extracted by a batched
  * per-partition decode kernel.
  *
  * The decode kernel itself is a STUB — the container has no
  * image/audio codecs — but it is a deterministic function of the
  * payload bytes, so the full Spark path (binary column → typed
  * Dataset → mapPartitions batch decode → metadata relation) is real
  * and oracle-checkable. A production deployment swaps
  * [[decodeMeta]]'s body for a codec call; the partitioning, schema,
  * and batch shape stay identical.
  */
object Multimodal {

  case class MediaPayload(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, byte_len: Long, width: Long,
                       height: Long, n_frames: Long)

  /** STUB decode: deterministic fake metadata derived from the bytes
    * (length + leading byte). Real impl: image header parse / ffprobe. */
  def decodeMeta(m: MediaPayload): MediaMeta = {
    val len = m.payload.length.toLong
    val first = if (m.payload.nonEmpty) (m.payload(0) & 0xffL) else 0L
    MediaMeta(m.doc_id, len, 16 + len % 640, 16 + (len * 7) % 480, 1 + first % 8)
  }

  /** Batched decode over a (doc_id, payload binary) DataFrame. Runs
    * partition-local with no shuffle; at scale each task decodes its
    * parquet row-group's payloads in one pass. */
  def decodeBatch(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[MediaPayload]
      .mapPartitions(_.map(decodeMeta))
  }
}
