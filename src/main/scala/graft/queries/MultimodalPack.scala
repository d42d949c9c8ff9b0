package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaPayload

/** Multimodal-column coverage over REAL codecs: per-doc deterministic
  * PNGs (and a multi-frame container of PNGs) are synthesized
  * partition-locally from `doc_id`, then pushed through the batched
  * `javax.imageio` decode kernels in `operators/Multimodal`.
  *
  * Oracle strategy: the generator's dimensions and pixel content are a
  * closed-form function of `doc_id` (see [[Multimodal.widthOf]] doc),
  * so DuckDB recomputes what a CORRECT decode must report — width,
  * height, per-frame pixel sums, raster min/max — without owning a
  * codec. The Spark side never consults that closed form after
  * synthesis: the kernels see only bytes and must genuinely inflate
  * the PNG and read the raster to match.
  */
object MultimodalPack extends QueryPack {

  /** Memoized binary-fixture tables: PNG-encoding 6k images per query
    * PER SWEEP was fixture GENERATION billed to the operator under
    * test (r14 bench: the family cost 21 s, mostly `ImageIO.write`).
    * A real pipeline reads image bytes from storage, so each payload
    * kind is synthesized ONCE per data dir into a TempDirs parquet
    * (the zorderDirs/pairTableDirs derived-layout pattern, fingerprint
    * keyed so a fixture rewrite misses) and every query reads the
    * binary column back — the DECODE kernels, the thing the queries
    * actually check, still run on every execution. */
  private val payloadDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def memoizedPayloads(s: SparkSession, d: String, kind: String)
                              (build: => Dataset[MediaPayload]): DataFrame =
    // fingerprintKeyAny: local walk for driver-local dirs, Hadoop-FS
    // stat for remote ones (a remote dir previously degenerated to one
    // constant digest — stale payloads across fixture rewrites, r15
    // ADVICE). A path that stats nowhere skips the memo entirely so
    // the documents reader's own error surfaces from `build`.
    (try Some(Tables.fingerprintKeyAny(s, s"$d/documents.parquet"))
     catch { case _: java.io.IOException => None }) match {
      case Some(fp) =>
        val dir = payloadDirs.computeIfAbsent(s"$fp#$kind", _ => {
          val out = graft.TempDirs.create(s"graft_media_$kind").toString
          build.toDF().write.mode("overwrite").parquet(out)
          out
        })
        // r17: spread the read-back before the decode kernels (the
        // docsSpread rule): the memoized table is a handful of files,
        // and file-split packing (openCostInBytes) lands them in 2-4
        // scan tasks — serializing the per-row codec work, the actual
        // cost of every query in this pack. One tiny payload shuffle
        // buys full decode parallelism; decode stays row-local.
        // r18: explicit 8 KB/task target — codec kernels cost far
        // more per byte than the hash kernels the adaptive default is
        // sized for, so the decode keeps (near-)full width at any
        // payload size.
        Tables.spread(s, s.read.parquet(dir), targetBytesPerTask = 8192L)
      case None => build.toDF()
    }

  /** Synthesized single-image fixture: one real PNG per doc. Built in
    * a typed map (partition-local; only `doc_id` is scanned). */
  private def pngPayloads(s: SparkSession, d: String): DataFrame =
    memoizedPayloads(s, d, "png") {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map(id => MediaPayload(id, Multimodal.synthPng(id)))
    }

  private def containerPayloads(s: SparkSession, d: String): DataFrame =
    memoizedPayloads(s, d, "container") {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map(id => MediaPayload(id, Multimodal.synthContainer(id)))
    }

  /** Real decode battery including corrupt blobs: every doc_id % 97 ==
    * 0 payload is truncated to its first 8 bytes (a bare PNG magic —
    * the reader engages, then hits EOF), and the kernel must emit a
    * null-metadata row for it rather than fail the task. */
  def qImageDecode(s: SparkSession, d: String): DataFrame = {
    val payloads = memoizedPayloads(s, d, "png_corrupt") {
      import s.implicits._
      Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          val png = Multimodal.synthPng(id)
          MediaPayload(id, if (id % 97 == 0) png.take(8) else png)
        }
    }
    Multimodal.decodeBatch(payloads).toDF().orderBy(col("doc_id"))
  }

  /** Container metadata: header walk + a real decode of frame 0. */
  def qMultimodalMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.containerMetaBatch(containerPayloads(s, d)).toDF()
      .orderBy(col("doc_id"))

  /** Real resize: decode → nearest-neighbor ÷2 → measure the actual
    * resized raster (transform-then-measure, no shortcuts). */
  def qMediaResize(s: SparkSession, d: String): DataFrame =
    Multimodal.resizeBatch(pngPayloads(s, d), factor = 2).toDF()
      .orderBy(col("doc_id"))

  /** Real frame sampling: seek every 2nd frame in the container and
    * decode only those, emitting per-frame dims + pixel sums. */
  def qFrameSample(s: SparkSession, d: String): DataFrame =
    Multimodal.frameSampleBatch(containerPayloads(s, d), stride = 2).toDF()
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Real feature extraction: full raster statistics per image. */
  def qMediaFeatures(s: SparkSession, d: String): DataFrame =
    Multimodal.extractFeaturesBatch(pngPayloads(s, d)).toDF()
      .orderBy(col("doc_id"))

  val queries: Map[String, Q] = Map(
    "q_image_decode"    -> qImageDecode,
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_media_resize"    -> qMediaResize,
    "q_frame_sample"    -> qFrameSample,
    "q_media_features"  -> qMediaFeatures,
  )

  /** Shared closed-form spec (mirrors Multimodal.widthOf/heightOf/
    * fillOf/framesOf): w = 16 + (d*37)%240, h = 16 + (d*53)%180,
    * v = (d*97)%256, nf = 1 + d%5; pixel(x,y) of frame f =
    * (v + 17f + y) % 256. */
  private val specCte =
    """WITH m AS (
      |  SELECT doc_id,
      |         16 + (doc_id * 37) % 240 AS w,
      |         16 + (doc_id * 53) % 180 AS h,
      |         (doc_id * 97) % 256 AS v,
      |         1 + doc_id % 5 AS nf
      |  FROM documents)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_image_decode" -> (specCte +
      """, px AS (
        |  SELECT doc_id, w, h, sum(w * ((v + y) % 256)) AS s
        |  FROM m, unnest(generate_series(0, h - 1)) AS t(y)
        |  GROUP BY doc_id, w, h)
        |SELECT doc_id,
        | CASE WHEN doc_id % 97 = 0 THEN NULL ELSE CAST(w AS BIGINT) END AS img_w,
        | CASE WHEN doc_id % 97 = 0 THEN NULL ELSE CAST(h AS BIGINT) END AS img_h,
        | CASE WHEN doc_id % 97 = 0 THEN NULL ELSE CAST(s AS BIGINT) END AS px_sum
        |FROM px ORDER BY doc_id""".stripMargin),
    "q_multimodal_meta" -> (specCte +
      """
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |       CAST(nf AS BIGINT) AS n_frames
        |FROM m ORDER BY doc_id""".stripMargin),
    "q_media_resize" -> (specCte +
      """, r AS (SELECT doc_id, (w + 1) // 2 AS ow, (h + 1) // 2 AS oh, v FROM m)
        |SELECT doc_id, CAST(ow AS BIGINT) AS out_width,
        |       CAST(oh AS BIGINT) AS out_height,
        |       CAST(sum(ow * ((v + 2 * y) % 256)) AS BIGINT) AS out_px_sum
        |FROM r, unnest(generate_series(0, oh - 1)) AS t(y)
        |GROUP BY doc_id, ow, oh ORDER BY doc_id""".stripMargin),
    "q_frame_sample" -> (specCte +
      """, fr AS (
        |  SELECT doc_id, w, h, v, f
        |  FROM m, unnest(generate_series(0, nf - 1)) AS t(f)
        |  WHERE f % 2 = 0)
        |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |       CAST(w AS BIGINT) AS frame_w, CAST(h AS BIGINT) AS frame_h,
        |       CAST(sum(w * ((v + 17 * f + y) % 256)) AS BIGINT) AS frame_px_sum
        |FROM fr, unnest(generate_series(0, h - 1)) AS t2(y)
        |GROUP BY doc_id, f, w, h ORDER BY doc_id, frame_idx""".stripMargin),
    "q_media_features" -> (specCte +
      """
        |SELECT doc_id, CAST(w * h AS BIGINT) AS n_pixels,
        |       CAST(sum(w * ((v + y) % 256)) AS BIGINT) AS px_sum,
        |       CAST(min((v + y) % 256) AS BIGINT) AS px_min,
        |       CAST(max((v + y) % 256) AS BIGINT) AS px_max
        |FROM m, unnest(generate_series(0, h - 1)) AS t(y)
        |GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin),
  )
}
