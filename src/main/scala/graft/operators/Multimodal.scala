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

  case class ResizedMeta(doc_id: Long, out_len: Long, out_width: Long,
                         out_height: Long)

  /** STUB resize: keep every `factor`-th byte of the payload (real
    * impl: bilinear downscale); metadata recomputed from the ACTUAL
    * resized buffer so the query exercises the full
    * transform-then-measure path, not arithmetic shortcuts. */
  def resizeStub(m: MediaPayload, factor: Int): ResizedMeta = {
    require(factor > 0, s"factor must be positive, got $factor")
    val out = m.payload.indices.collect {
      case i if i % factor == 0 => m.payload(i)
    }
    val len = out.length.toLong
    ResizedMeta(m.doc_id, len, 16 + len % 320, 16 + (len * 5) % 240)
  }

  /** Batched resize kernel — same partition-local shape as
    * [[decodeBatch]]. */
  def resizeBatch(df: DataFrame, factor: Int): Dataset[ResizedMeta] = {
    require(factor > 0, s"factor must be positive, got $factor")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[MediaPayload]
      .mapPartitions(_.map(resizeStub(_, factor)))
  }

  case class FrameRow(doc_id: Long, frame_idx: Long, frame_off: Long,
                      frame_sig: Long)

  /** STUB frame sampling: the payload's [[decodeMeta]] frame count,
    * sampled every `stride`-th frame; per frame the kernel emits the
    * byte offset it would seek to and a deterministic signature (real
    * impl: decode the frame, emit a thumbnail/phash). One input row
    * explodes to ceil(n_frames/stride) output rows partition-locally —
    * the flatMap shape a video pipeline needs. */
  def frameSample(m: MediaPayload, stride: Int): Iterator[FrameRow] = {
    require(stride > 0, s"stride must be positive, got $stride")
    val meta = decodeMeta(m)
    val first = if (m.payload.nonEmpty) (m.payload(0) & 0xffL) else 0L
    (0L until meta.n_frames by stride.toLong).iterator.map { idx =>
      FrameRow(m.doc_id, idx, idx * meta.byte_len / meta.n_frames,
        (first * 31 + idx * 7) % 256)
    }
  }

  def frameSampleBatch(df: DataFrame, stride: Int): Dataset[FrameRow] = {
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[MediaPayload]
      .mapPartitions(_.flatMap(frameSample(_, stride)))
  }

  case class MediaFeatures(doc_id: Long, n_bytes: Long, n_alpha: Long,
                           n_digit: Long, n_space: Long, n_other: Long)

  /** STUB feature extraction: decode the payload as UTF-8 and count
    * ASCII character classes (real impl: a vision/audio embedding
    * model over the decoded buffer). Classes are ASCII-explicit —
    * Unicode letters like CJK land in `n_other` — so any engine
    * recomputes them identically. */
  def extractFeatures(m: MediaPayload): MediaFeatures = {
    val s = new String(m.payload, java.nio.charset.StandardCharsets.UTF_8)
    var alpha = 0L; var digit = 0L; var space = 0L; var other = 0L
    // iterate CODEPOINTS, not UTF-16 units, so counts match any
    // engine's codepoint-based length() semantics
    var i = 0
    while (i < s.length) {
      val c = s.codePointAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) alpha += 1
      else if (c >= '0' && c <= '9') digit += 1
      else if (c == ' ') space += 1
      else other += 1
      i += Character.charCount(c)
    }
    MediaFeatures(m.doc_id, m.payload.length.toLong, alpha, digit, space, other)
  }

  def extractFeaturesBatch(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[MediaPayload]
      .mapPartitions(_.map(extractFeatures))
  }
}
