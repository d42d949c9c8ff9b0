package graft.ml

/** M15 `get_optimal_clusters` (`feature_clustering.py:39-132`): cluster
  * features from a pairwise distance matrix, choosing the cluster
  * count by silhouette scan.
  *
  * The distributed part is producing the (i, j, dist) edge list (a
  * groupBy-aggregate query — see InfoPack's pairwise queries); the
  * matrix is over FEATURES (310x310 in the reference), so clustering
  * itself is driver-side — same division of labor as the reference
  * (SURVEY §3.3). Average-linkage agglomerative clustering stands in
  * for sklearn's AgglomerativeClustering; deterministic with
  * index-based tie-breaks.
  */
object Clustering {

  /** Average-linkage agglomerative clustering of an n x n distance
    * matrix down to k clusters. Returns cluster label per index
    * (labels are the smallest member index, then densely re-numbered
    * in index order for determinism).
    */
  def agglomerate(dist: Array[Array[Double]], k: Int): Array[Int] = {
    val n = dist.length
    var clusters = (0 until n).map(i => Vector(i)).toBuffer
    while (clusters.size > k) {
      var best = (0, 1)
      var bestD = Double.MaxValue
      for (a <- clusters.indices; b <- (a + 1) until clusters.size) {
        var s = 0.0
        for (i <- clusters(a); j <- clusters(b)) s += dist(i)(j)
        val d = s / (clusters(a).size * clusters(b).size)
        if (d < bestD - 1e-12) { bestD = d; best = (a, b) }
      }
      val (a, b) = best
      val merged = clusters(a) ++ clusters(b)
      clusters.remove(b); clusters.remove(a)
      clusters.append(merged.sorted)
    }
    val labelOf = new Array[Int](n)
    clusters.toSeq.sortBy(_.min).zipWithIndex.foreach {
      case (members, lbl) => members.foreach(i => labelOf(i) = lbl)
    }
    labelOf
  }

  /** Mean silhouette coefficient of a labeling over a distance matrix
    * (`feature_clustering.py`'s selection criterion). */
  def silhouette(dist: Array[Array[Double]], labels: Array[Int]): Double = {
    val n = dist.length
    val byLabel = labels.indices.groupBy(labels(_))
    if (byLabel.size < 2) return -1.0
    val scores = (0 until n).map { i =>
      val own = byLabel(labels(i)).filterNot(_ == i)
      val a = if (own.isEmpty) 0.0 else own.map(dist(i)).sum / own.size
      val b = byLabel.collect {
        case (l, members) if l != labels(i) =>
          members.map(dist(i)).sum / members.size
      }.min
      if (own.isEmpty) 0.0 else (b - a) / math.max(a, b)
    }
    scores.sum / n
  }

  /** k-medoids over a precomputed distance matrix — the reference's
    * second scanned algorithm (`feature_clustering.py:84-105`,
    * sklearn_extra KMedoids, metric='precomputed'). PAM with a
    * deterministic BUILD init (first medoid minimizes total distance;
    * each next medoid maximizes cost reduction, ties by index — the
    * deterministic stand-in for k-medoids++ seeding) and best-swap
    * refinement to a local optimum. Labels are densely re-numbered by
    * smallest member index, same convention as [[agglomerate]]. */
  def kMedoids(dist: Array[Array[Double]], k: Int, maxIter: Int = 200): Array[Int] = {
    val n = dist.length
    require(k >= 1 && k <= n)
    val medoids = scala.collection.mutable.ArrayBuffer[Int]()
    medoids += (0 until n).minBy(i => (dist(i).sum, i))
    while (medoids.size < k) {
      val nearest = Array.tabulate(n)(j => medoids.map(dist(j)).min)
      val cand = (0 until n).filterNot(medoids.contains)
        .maxBy(c => ((0 until n).map(j => math.max(0.0, nearest(j) - dist(c)(j))).sum, -c))
      medoids += cand
    }
    def cost(ms: Seq[Int]): Double =
      (0 until n).map(j => ms.map(dist(j)).min).sum
    var cur = medoids.toVector.sorted
    var curCost = cost(cur)
    var improved = true
    var iter = 0
    while (improved && iter < maxIter) {
      improved = false
      iter += 1
      val swaps = for {
        m <- cur; h <- 0 until n if !cur.contains(h)
      } yield (cur.filterNot(_ == m) :+ h).sorted
      if (swaps.nonEmpty) {
        val best = swaps.minBy(ms => (cost(ms), ms.mkString(",")))
        val bestCost = cost(best)
        if (bestCost < curCost - 1e-12) {
          cur = best; curCost = bestCost; improved = true
        }
      }
    }
    val labelsRaw = Array.tabulate(n)(j => cur.minBy(m => (dist(j)(m), m)))
    val labelOf = new Array[Int](n)
    labelsRaw.indices.groupBy(labelsRaw(_)).toSeq.sortBy(_._2.min).zipWithIndex
      .foreach { case ((_, members), lbl) => members.foreach(i => labelOf(i) = lbl) }
    labelOf
  }

  /** Density-based clustering over a precomputed distance matrix — the
    * deterministic stand-in for the reference's third scanned
    * algorithm, HDBSCAN (`feature_clustering.py:108-131`, min-cluster-
    * size scan, metric='precomputed'). Classic DBSCAN reachability:
    * core point = >= minPts neighbors within eps (self included);
    * clusters grow by BFS from core points in index order (ties are
    * index-deterministic); non-reachable points are noise. Noise keeps
    * the single label -1 — the same convention sklearn's silhouette
    * sees from HDBSCAN's fit_predict (noise scored as one group). */
  def dbscan(dist: Array[Array[Double]], eps: Double, minPts: Int): Array[Int] = {
    val n = dist.length
    val labels = Array.fill(n)(Int.MinValue) // unvisited
    val core = Array.tabulate(n)(i => (0 until n).count(j => dist(i)(j) <= eps) >= minPts)
    var cid = 0
    for (i <- 0 until n if core(i) && labels(i) == Int.MinValue) {
      labels(i) = cid
      val queue = scala.collection.mutable.Queue(i)
      while (queue.nonEmpty) {
        val p = queue.dequeue()
        if (core(p)) {
          for (q <- 0 until n if dist(p)(q) <= eps && labels(q) == Int.MinValue) {
            labels(q) = cid
            queue.enqueue(q)
          }
        }
      }
      cid += 1
    }
    labels.map(l => if (l == Int.MinValue) -1 else l)
  }

  /** The eps heuristic for [[dbscan]] at a given minPts: the median
    * over points of the distance to each point's minPts-th nearest
    * OTHER point (index minPts of the sorted row, self at index 0) —
    * the standard k-distance elbow stand-in, fully deterministic. */
  def epsFor(dist: Array[Array[Double]], minPts: Int): Double = {
    val kd = dist.map(row => row.sorted.apply(math.min(minPts, row.length - 1)))
    kd.sorted.apply(kd.length / 2)
  }

  /** W2 argmax scan over candidate cluster counts: fit each k, keep the
    * best silhouette (`feature_clustering.py:53-131`). */
  def optimalClusters(dist: Array[Array[Double]], ks: Seq[Int]): (Int, Array[Int], Double) =
    ks.map { k =>
      val labels = agglomerate(dist, k)
      (k, labels, silhouette(dist, labels))
    }.maxBy(_._3)

  /** Full algorithm scan — a DELIBERATE extension of the reference:
    * `get_optimal_clusters` (`feature_clustering.py:39-132`) scans the
    * parameter only WITHIN one caller-chosen type (singlelink /
    * kmedoids / hdbscan) and scores mean/var of per-sample silhouettes;
    * here all three algorithm families enter one scan scored by MEAN
    * silhouette (mean/var is unstable as var -> 0 on near-uniform
    * labelings), so the caller gets the best (algorithm, param) pair
    * in one call. For the density family each k plays HDBSCAN's
    * min-cluster-size role: minPts = k with the [[epsFor]] k-distance
    * heuristic. Determinism: ties resolve to the lexicographically
    * GREATEST algorithm name — concretely "kmedoids" > "density" >
    * "agglomerative" — then the SMALLER k. */
  def optimalClustersScan(dist: Array[Array[Double]],
                          ks: Seq[Int]): (String, Int, Array[Int], Double) =
    (for {
      (name, fit) <- Seq[(String, (Array[Array[Double]], Int) => Array[Int])](
        "agglomerative" -> (agglomerate(_, _)),
        "kmedoids" -> (kMedoids(_, _)),
        "density" -> ((d, k) => dbscan(d, epsFor(d, k), k)))
      k <- ks
    } yield {
      val labels = fit(dist, k)
      (name, k, labels, silhouette(dist, labels))
    }).maxBy { case (name, k, _, sil) => (sil, name, -k) }
}
