package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ — the composition every production ANN system runs at scale
  * (FAISS `IndexIVFPQ`; Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011, §IV): an inverted-file coarse
  * quantizer prunes the corpus to `nprobe` posting lists per query,
  * and product-quantized codes stand in for the vectors inside them,
  * so search touches nprobe/k of the data AND reads ~bytes per vector
  * instead of the float payload. Codes encode the RESIDUAL (v − its
  * coarse centroid), the paper's key refinement: residuals concentrate
  * near 0, so the same codebook budget buys materially lower
  * distortion than encoding raw vectors (IvfPqSpec measures it).
  *
  * Scale shape: both quantizers train driver-side on bounded
  * deterministic samples (the [[Ivf]]/[[Pq]] collect-at-edges rule);
  * assignment + residual encoding is ONE mapPartitions corpus pass
  * with the tiny centroid/codebook matrices broadcast; search is a
  * cluster-keyed candidate join against the code relation only. The
  * reference has no ANN operator — this extends the training-pipeline
  * battery (SURVEY §2 north star: similarity search over an embedding
  * column). */
object IvfPq {

  /** posting: (vec_id, cluster, codes). Centroids and codebooks ride
    * along for search/diagnostics. */
  case class Index(posting: DataFrame,
                   centroids: Array[Array[Double]],
                   codebooks: Pq.Codebooks)

  /** Coarse k-means (k lists) + residual PQ (m subspaces × kc codes),
    * trained on the same bounded seeded-hash sample discipline as the
    * component operators, encoded in one corpus pass. */
  def build(embeddings: DataFrame, k: Int, m: Int, kc: Int,
            seed: Long): Index = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = embeddings
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val sampleN = math.max(64 * math.max(k, kc), 1024)
    val sample = vecs
      .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id")).limit(sampleN)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val centroids = graft.ml.Lloyd.fit(sample, k, iters = 10)
    // residual codebooks: per subspace, Lloyd over the SAMPLE's
    // residuals w.r.t. its own coarse assignment — the distribution
    // the corpus codes will actually quantize
    val residSample = sample.map { v =>
      val c = centroids(graft.ml.Lloyd.nearest(v, centroids))
      Array.tabulate(dim)(i => v(i) - c(i))
    }
    val codebooks: Pq.Codebooks = Array.tabulate(m) { sub =>
      val off = sub * subDim
      val pts = residSample.map(r => java.util.Arrays.copyOfRange(r, off, off + subDim))
      graft.ml.Lloyd.fit(pts, kc, iters = 15)
    }
    val bcC = spark.sparkContext.broadcast(centroids)
    val bcB = spark.sparkContext.broadcast(codebooks)
    val posting = vecs.as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val cents = bcC.value; val cb = bcB.value
        rows.map { case (id, v) =>
          val ci = graft.ml.Lloyd.nearest(v, cents)
          val c = cents(ci)
          val codes = new Array[Int](m)
          var sub = 0
          while (sub < m) {
            val cw = cb(sub); val off = sub * subDim
            var best = 0; var bd = Double.MaxValue; var j = 0
            while (j < cw.length) {
              var d = 0.0; var i = 0
              while (i < subDim) {
                val x = (v(off + i) - c(off + i)) - cw(j)(i)
                d += x * x; i += 1
              }
              if (d < bd) { bd = d; best = j }
              j += 1
            }
            codes(sub) = best
            sub += 1
          }
          (id, ci, codes)
        }
      }.toDF("vec_id", "cluster", "codes")
    Index(posting, centroids, codebooks)
  }

  /** ADC search over the probed lists: per (query, probed cluster) an
    * m × kc LUT of exact subspace distances between the query's OWN
    * residual (qv − that cluster's centroid) and the codewords —
    * driver arithmetic on the tiny matrices — then every candidate
    * costs m lookups against its codes. Approximates squared L2
    * (the paper's ADC estimator); rank ties break by vec_id. */
  def search(index: Index, queries: Array[(Long, Array[Double])],
             nprobe: Int, topK: Int): DataFrame = {
    val spark = index.posting.sparkSession
    import spark.implicits._
    val m = index.codebooks.length
    val subDim = index.codebooks(0)(0).length
    val probesSeq = queries.flatMap { case (qid, qv) =>
      index.centroids.zipWithIndex.map { case (c, ci) =>
        var d = 0.0; var i = 0
        while (i < qv.length) { val x = qv(i) - c(i); d += x * x; i += 1 }
        (qid, ci, d)
      }.sortBy(t => (t._3, t._2)).take(nprobe).map(t => (t._1, t._2))
    }.toSeq
    val byId = queries.toMap
    val luts: Map[(Long, Int), Array[Array[Double]]] =
      probesSeq.map { case (qid, ci) =>
        val qv = byId(qid)
        val c = index.centroids(ci)
        (qid, ci) -> Array.tabulate(m) { sub =>
          val off = sub * subDim
          index.codebooks(sub).map { cw =>
            var d = 0.0; var i = 0
            while (i < subDim) {
              val x = (qv(off + i) - c(off + i)) - cw(i)
              d += x * x; i += 1
            }
            d
          }
        }
      }.toMap
    val bcL = spark.sparkContext.broadcast(luts)
    val probes = probesSeq.toDF("q_id", "cluster")
    val cand = index.posting.join(broadcast(probes), "cluster")
      .select(col("q_id"), col("cluster"), col("vec_id"), col("codes"))
      .as[(Long, Int, Long, Array[Int])]
      .mapPartitions { rows =>
        val ls = bcL.value
        rows.map { case (qid, ci, id, cs) =>
          val lut = ls((qid, ci))
          var d = 0.0; var sub = 0
          while (sub < m) { d += lut(sub)(cs(sub)); sub += 1 }
          (qid, id, d)
        }
      }.toDF("q_id", "vec_id", "adc")
    cand.filter(col("vec_id") =!= col("q_id"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("adc"), col("vec_id"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(col("adc"), 6).as("adc_d2"), col("rank"))
  }
}
