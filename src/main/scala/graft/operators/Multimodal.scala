package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream,
  DataOutputStream}
import javax.imageio.ImageIO

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column operators (north star): media payloads are opaque
  * `binary` columns with typed metadata extracted by batched
  * per-partition decode kernels.
  *
  * The decode kernels are REAL codec calls — the JDK ships
  * `javax.imageio` (PNG/JPEG/BMP/GIF, zero external dependencies) — so
  * the full Spark path is binary column → typed Dataset →
  * mapPartitions batch decode (actual PNG inflate + raster read) →
  * metadata relation. Undecodable payloads (truncated, not an image)
  * yield null metadata rows rather than failing the task, the contract
  * a 100 TB crawl with corrupt blobs needs.
  *
  * For oracle checkability the test fixture is synthesized by
  * [[synthPng]]/[[synthContainer]]: dimensions and pixel content are a
  * closed-form function of `doc_id` (documented on each generator), so
  * any engine can recompute what a CORRECT decode must report without
  * itself owning a codec. The kernels never see that closed form — they
  * only see bytes and must genuinely decode them.
  *
  * Scale shape: synthesis and decode are partition-local (no shuffle);
  * at 100 TB each task decodes its parquet row-group's payloads in one
  * pass and only KB-sized metadata rows ever move. Mirrors the
  * reference's per-row metadata extraction (reduction-dask
  * `loaders.py` treats opaque columns the same way).
  */
object Multimodal {

  /** ImageIO's default stream cache spills to temp FILES per decode;
    * with thousands of in-memory byte-array payloads per task that is
    * pure overhead. Disable once per executor JVM. */
  private lazy val imageIoInit: Unit = ImageIO.setUseCache(false)

  // ---------------------------------------------------------------
  // Deterministic synthesis (closed-form; the oracle's ground truth)
  // ---------------------------------------------------------------

  /** Closed-form image spec for `doc_id` d (all oracle-recomputable):
    *   width  = 16 + (d * 37) % 240
    *   height = 16 + (d * 53) % 180
    *   fill   = (d * 97) % 256
    *   pixel(x, y) of frame f = (fill + 17*f + y) % 256  (row-constant,
    *     grayscale) — varies within each image so a correct pixel sum
    *     requires actually reading the decoded raster, not just the
    *     header.
    */
  def widthOf(d: Long): Int  = (16L + java.lang.Math.floorMod(d * 37L, 240L)).toInt
  def heightOf(d: Long): Int = (16L + java.lang.Math.floorMod(d * 53L, 180L)).toInt
  def fillOf(d: Long): Int   = java.lang.Math.floorMod(d * 97L, 256L).toInt
  /** Frames in the synthetic video container: 1 + d % 5. */
  def framesOf(d: Long): Int = (1L + java.lang.Math.floorMod(d, 5L)).toInt

  /** One real PNG (grayscale, spec above), encoded by the JDK writer. */
  def synthPng(docId: Long, frame: Int = 0): Array[Byte] = {
    imageIoInit
    val w = widthOf(docId); val h = heightOf(docId); val v = fillOf(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      java.util.Arrays.fill(row, (v + 17 * frame + y) % 256)
      raster.setSamples(0, y, w, 1, 0, row)
      y += 1
    }
    val out = new ByteArrayOutputStream(w * h / 4 + 128)
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private val ContainerMagic = 0x47465456 // "GFTV"

  /** A length-prefixed multi-frame container: magic, frame count, then
    * `len:int32 BE` + PNG bytes per frame. Each frame is a REAL PNG
    * (same dims, fill offset 17*f), so frame sampling must seek and
    * genuinely decode. */
  def synthContainer(docId: Long): Array[Byte] = {
    val n = framesOf(docId)
    val out = new ByteArrayOutputStream(4096)
    val dos = new DataOutputStream(out)
    dos.writeInt(ContainerMagic)
    dos.writeInt(n)
    var f = 0
    while (f < n) {
      val png = synthPng(docId, f)
      dos.writeInt(png.length)
      dos.write(png)
      f += 1
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // Real decode kernels
  // ---------------------------------------------------------------

  case class MediaPayload(doc_id: Long, payload: Array[Byte])

  /** Decoded single-image facts: everything below requires a real
    * inflate + raster read (px_* are functions of decoded samples). */
  final case class Decoded(width: Int, height: Int, pxSum: Long,
                           pxMin: Int, pxMax: Int)

  /** The real decode: `ImageIO.read` (PNG/JPEG/BMP/GIF via the JDK's
    * registered readers) then a full raster scan. None on anything the
    * codec rejects — truncated stream, wrong magic, empty payload. */
  def decodeImage(bytes: Array[Byte]): Option[Decoded] = {
    imageIoInit
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None else Some(measure(img))
    } catch { case NonFatal(_) => None }
  }

  private def measure(img: BufferedImage): Decoded = {
    val w = img.getWidth; val h = img.getHeight
    val raster = img.getRaster
    val row = new Array[Int](w)
    var sum = 0L; var min = 255; var max = 0
    var y = 0
    while (y < h) {
      raster.getSamples(0, y, w, 1, 0, row)
      var x = 0
      while (x < w) {
        val p = row(x)
        sum += p
        if (p < min) min = p
        if (p > max) max = p
        x += 1
      }
      y += 1
    }
    Decoded(w, h, sum, min, max)
  }

  case class ImageMeta(doc_id: Long, img_w: Option[Long],
                       img_h: Option[Long], px_sum: Option[Long])

  /** Batched real decode over a (doc_id, payload binary) DataFrame.
    * Partition-local, no shuffle; undecodable payloads → null columns
    * (the row survives so corrupt-blob rates stay observable). */
  def decodeBatch(df: DataFrame): Dataset[ImageMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[MediaPayload]
      .mapPartitions(_.map { m =>
        decodeImage(m.payload) match {
          case Some(d) => ImageMeta(m.doc_id, Some(d.width.toLong),
            Some(d.height.toLong), Some(d.pxSum))
          case None => ImageMeta(m.doc_id, None, None, None)
        }
      })
  }

  case class ResizedMeta(doc_id: Long, out_width: Long, out_height: Long,
                         out_px_sum: Long)

  /** Real resize: decode, nearest-neighbor downscale by `factor`
    * (out(x', y') = in(factor*x', factor*y'), out dims = ceil(in/f)),
    * then measure the ACTUAL resized raster — the transform-then-
    * measure path, no arithmetic shortcuts. Deterministic across JVMs
    * (integer sampling; no Graphics2D interpolation). */
  def resizeImage(bytes: Array[Byte], factor: Int): Option[Decoded] = {
    require(factor > 0, s"factor must be positive, got $factor")
    imageIoInit
    if (bytes == null || bytes.length == 0) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      val ow = (w + factor - 1) / factor
      val oh = (h + factor - 1) / factor
      val outImg = new BufferedImage(ow, oh, BufferedImage.TYPE_BYTE_GRAY)
      val in = img.getRaster; val outR = outImg.getRaster
      var y = 0
      while (y < oh) {
        var x = 0
        while (x < ow) {
          outR.setSample(x, y, 0, in.getSample(x * factor, y * factor, 0))
          x += 1
        }
        y += 1
      }
      Some(measure(outImg))
    } catch { case NonFatal(_) => None }
  }

  /** Batched resize kernel — same partition-local shape as
    * [[decodeBatch]]; undecodable payloads are dropped (a resize
    * pipeline has nothing to emit for them). */
  def resizeBatch(df: DataFrame, factor: Int): Dataset[ResizedMeta] = {
    require(factor > 0, s"factor must be positive, got $factor")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[MediaPayload]
      .mapPartitions(_.flatMap { m =>
        resizeImage(m.payload, factor).map(d =>
          ResizedMeta(m.doc_id, d.width.toLong, d.height.toLong, d.pxSum))
      })
  }

  case class ContainerMeta(doc_id: Long, width: Long, height: Long,
                           n_frames: Long)

  /** Container metadata: parse the header, walk the frame index
    * (length prefixes only — no decode of later frames), and really
    * decode frame 0 for dimensions. The ffprobe-shaped kernel. */
  def containerMeta(m: MediaPayload): Option[ContainerMeta] = {
    imageIoInit
    try {
      val dis = new DataInputStream(new ByteArrayInputStream(m.payload))
      if (dis.readInt() != ContainerMagic) return None
      val n = dis.readInt()
      if (n <= 0 || n > (1 << 20)) return None
      val len0 = dis.readInt()
      val first = new Array[Byte](len0)
      dis.readFully(first)
      var f = 1
      while (f < n) { dis.skipNBytes(dis.readInt().toLong); f += 1 }
      decodeImage(first).map(d =>
        ContainerMeta(m.doc_id, d.width.toLong, d.height.toLong, n.toLong))
    } catch { case NonFatal(_) => None }
  }

  def containerMetaBatch(df: DataFrame): Dataset[ContainerMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[MediaPayload]
      .mapPartitions(_.flatMap(containerMeta))
  }

  case class FrameRow(doc_id: Long, frame_idx: Long, frame_w: Long,
                      frame_h: Long, frame_px_sum: Long)

  /** Real frame sampling: parse the container header, seek to every
    * `stride`-th frame, and genuinely decode THAT frame's PNG (skipped
    * frames' bytes are skipped, not decoded — the seek-and-decode
    * shape a video pipeline needs). One input row explodes to
    * ceil(n_frames/stride) output rows partition-locally. */
  def frameSample(m: MediaPayload, stride: Int): Iterator[FrameRow] = {
    require(stride > 0, s"stride must be positive, got $stride")
    imageIoInit
    try {
      val dis = new DataInputStream(new ByteArrayInputStream(m.payload))
      if (dis.readInt() != ContainerMagic) return Iterator.empty
      val n = dis.readInt()
      if (n < 0 || n > (1 << 20)) return Iterator.empty
      val rows = Vector.newBuilder[FrameRow]
      var f = 0
      while (f < n) {
        val len = dis.readInt()
        if (f % stride == 0) {
          val buf = new Array[Byte](len)
          dis.readFully(buf)
          decodeImage(buf).foreach { d =>
            rows += FrameRow(m.doc_id, f.toLong, d.width.toLong,
              d.height.toLong, d.pxSum)
          }
        } else {
          dis.skipNBytes(len.toLong)
        }
        f += 1
      }
      rows.result().iterator
    } catch { case NonFatal(_) => Iterator.empty }
  }

  def frameSampleBatch(df: DataFrame, stride: Int): Dataset[FrameRow] = {
    require(stride > 0, s"stride must be positive, got $stride")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[MediaPayload]
      .mapPartitions(_.flatMap(frameSample(_, stride)))
  }

  case class MediaFeatures(doc_id: Long, n_pixels: Long, px_sum: Long,
                           px_min: Long, px_max: Long)

  /** Real feature extraction: decode and emit raster statistics (the
    * deterministic stand-in for an embedding model over the decoded
    * buffer — same decode + full-pixel pass, scalar outputs).
    * Undecodable payloads are dropped. */
  def extractFeaturesBatch(df: DataFrame): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[MediaPayload]
      .mapPartitions(_.flatMap { m =>
        decodeImage(m.payload).map(d =>
          MediaFeatures(m.doc_id, d.width.toLong * d.height,
            d.pxSum, d.pxMin.toLong, d.pxMax.toLong))
      })
  }
}
