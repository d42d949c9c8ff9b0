package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ml.Lloyd

/** IVF (inverted-file) approximate nearest neighbour — the
  * cluster-bucketed scale path for similarity search (north star:
  * "an IVF or LSH-bucketed variant"). Build: k-means coarse quantizer
  * over the corpus, each vector assigned to its nearest centroid's
  * posting list. Search: rank centroids per query, probe the top
  * `nprobe` lists, exact cosine only within them.
  *
  * At 100 TB the posting-list assignment is a write-time partition
  * key (one shuffle at build), and a query touches nprobe/k of the
  * data — the candidate join below is keyed on cluster id only.
  */
object Ivf {

  private def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  /** Corpus -> (vec_id, cluster, v, nrm) posting relation + centroids.
    * The quantizer trains DRIVER-SIDE ([[Lloyd]]) on a deterministic
    * bounded sample — the `sampleN` smallest seeded id-hashes, i.e. a
    * pseudo-random slice SPREAD over the whole id space (a head-of-ids
    * sample would bias centroids toward early ingestion and starve
    * late-id regions of posting lists); the orderBy+limit plans as
    * TakeOrdered, not a full sort. ASSIGNMENT is one mapPartitions
    * corpus pass with the (tiny) centroid matrix broadcast: no
    * per-iteration distributed jobs, centroid quality converges on the
    * sample long before a full corpus fit pays for itself. */
  def build(embeddings: DataFrame, k: Int, seed: Long): (DataFrame, Array[Array[Double]]) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = embeddings
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val sampleN = math.max(64 * k, 1024)
    val sample = vecs
      .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id")).limit(sampleN)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    val centroids = Lloyd.fit(sample, k, iters = 10)
    val bc = spark.sparkContext.broadcast(centroids)
    val assigned = vecs.as[(Long, Array[Double])]
      .mapPartitions { rows =>
        val cents = bc.value
        rows.map { case (id, v) => (id, Lloyd.nearest(v, cents), v) }
      }.toDF("vec_id", "cluster", "v")
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    (assigned, centroids)
  }

  /** Top-k cosine within the `nprobe` closest posting lists per query.
    * `queries`: (q_id, qv double array). Probe sets are computed from
    * the (tiny) centroid matrix and broadcast as a (q_id, cluster)
    * relation — the candidate join is cluster-keyed. */
  def search(posting: DataFrame, centroids: Array[Array[Double]],
             queries: DataFrame, nprobe: Int, topK: Int): DataFrame = {
    val spark = posting.sparkSession
    import spark.implicits._
    val qLocal = queries.select(col("q_id"), col("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val probes = qLocal.flatMap { case (qid, qv) =>
      centroids.zipWithIndex.map { case (c, ci) =>
        val d = c.zip(qv).map { case (a, b) => (a - b) * (a - b) }.sum
        (qid, ci, d)
      }.sortBy(_._3).take(nprobe).map(t => (t._1, t._2))
    }.toSeq.toDF("q_id", "cluster")
    val cand = posting.join(broadcast(probes), "cluster")
    val withQ = cand.join(broadcast(queries.select(col("q_id").as("qid2"),
        col("qv"), col("qn"))), col("q_id") === col("qid2"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6))
    withQ.withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("vec_id").as("n_id"), col("cos"), col("rank"))
  }
}
