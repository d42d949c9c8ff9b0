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
  /** Per-point silhouette terms `(a_i, b_i, s_i)` — mean intra-cluster
    * distance, min mean other-cluster distance, and the score
    * `(b-a)/max(a,b)` (0 for singletons, sklearn's convention).
    * Requires >= 2 labels (the [[silhouette]] wrapper guards). */
  def silhouetteTerms(dist: Array[Array[Double]],
                      labels: Array[Int]): IndexedSeq[(Double, Double, Double)] = {
    val byLabel = labels.indices.groupBy(labels(_))
    // b_i is a min over OTHER clusters: with a single label it is a
    // min over nothing — fail loudly here instead of an opaque
    // UnsupportedOperationException from .min ([[silhouette]] maps
    // this case to -1.0 before calling)
    require(byLabel.size >= 2,
      s"silhouette needs >= 2 clusters, got ${byLabel.size}")
    dist.indices.map { i =>
      val own = byLabel(labels(i)).filterNot(_ == i)
      val a = if (own.isEmpty) 0.0 else own.map(dist(i)).sum / own.size
      val b = byLabel.collect {
        case (l, members) if l != labels(i) =>
          members.map(dist(i)).sum / members.size
      }.min
      val s = if (own.isEmpty) 0.0 else (b - a) / math.max(a, b)
      (a, b, s)
    }
  }

  def silhouette(dist: Array[Array[Double]], labels: Array[Int]): Double = {
    if (labels.distinct.length < 2) return -1.0
    val scores = silhouetteTerms(dist, labels).map(_._3)
    scores.sum / dist.length
  }

  /** k-medoids over a precomputed distance matrix — the reference's
    * second scanned algorithm (`feature_clustering.py:84-105`,
    * sklearn_extra KMedoids, metric='precomputed'). PAM with a
    * deterministic BUILD init (first medoid minimizes total distance;
    * each next medoid maximizes cost reduction, ties by index — the
    * deterministic stand-in for k-medoids++ seeding) and best-swap
    * refinement to a local optimum. Labels are densely re-numbered by
    * smallest member index, same convention as [[agglomerate]]. */
  /** PAM's deterministic BUILD seeding, exposed on its own: the first
    * medoid minimizes total distance; each next medoid maximizes cost
    * reduction; ties break by smaller index. Pure relational
    * arithmetic over the distance matrix (sums, argmin/argmax), which
    * is what lets `q_cluster_silhouette` recompute it in the DuckDB
    * oracle and put this seeding under the hash check. */
  def buildInit(dist: Array[Array[Double]], k: Int): Seq[Int] = {
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
    medoids.toSeq
  }

  def kMedoids(dist: Array[Array[Double]], k: Int, maxIter: Int = 200): Array[Int] = {
    val n = dist.length
    val medoids = scala.collection.mutable.ArrayBuffer[Int](buildInit(dist, k): _*)
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

  /** TRUE HDBSCAN over a precomputed distance matrix — the reference's
    * third scanned algorithm (`feature_clustering.py:108-131`,
    * hdbscan.HDBSCAN(min_cluster_size, metric='precomputed')),
    * implemented from the published algorithm (Campello, Moulavi &
    * Sander 2013; McInnes & Healy 2017): mutual-reachability distances
    * (core distance = minSamples-th nearest, self included) → Prim MST
    * → single-linkage dendrogram → condensed tree at minClusterSize →
    * leave-one-out stability Σ(λ_leave − λ_birth) → excess-of-mass
    * cluster selection (root excluded, matching the library's
    * allow_single_cluster=False default). Deterministic: index
    * tie-breaks in the MST and ascending (weight, i, j) merge order.
    * Noise is −1; cluster labels are densely renumbered by smallest
    * member index, same convention as [[agglomerate]]. */
  def hdbscan(dist: Array[Array[Double]], minClusterSize: Int,
              minSamples: Int): Array[Int] = {
    val n = dist.length
    if (n == 0) return Array.empty
    val mcs = math.max(2, minClusterSize)
    val core = Array.tabulate(n) { i =>
      val row = dist(i).clone().sorted
      row(math.min(math.max(1, minSamples) - 1, n - 1))
    }
    def mreach(i: Int, j: Int): Double =
      math.max(dist(i)(j), math.max(core(i), core(j)))
    // Prim over the implicit complete mutual-reachability graph
    val inTree = Array.fill(n)(false)
    val dmin = Array.fill(n)(Double.MaxValue)
    val from = Array.fill(n)(-1)
    dmin(0) = 0.0
    val mst = scala.collection.mutable.ArrayBuffer[(Double, Int, Int)]()
    for (_ <- 0 until n) {
      val u = (0 until n).filterNot(inTree).minBy(v => (dmin(v), v))
      inTree(u) = true
      if (from(u) >= 0)
        mst += ((dmin(u), math.min(u, from(u)), math.max(u, from(u))))
      var v = 0
      while (v < n) {
        if (!inTree(v)) {
          val w = mreach(u, v)
          if (w < dmin(v)) { dmin(v) = w; from(v) = u }
        }
        v += 1
      }
    }
    // single-linkage dendrogram: leaves 0..n-1, internal node n+t for
    // the t-th merge (ascending weight, index tie-break)
    val nodeA = new Array[Int](n - 1)
    val nodeB = new Array[Int](n - 1)
    val nodeD = new Array[Double](n - 1)
    val setOf = Array.tabulate(2 * n - 1)(identity) // union-find w/ node ids
    def find(x: Int): Int = if (setOf(x) == x) x else { setOf(x) = find(setOf(x)); setOf(x) }
    mst.sortBy(e => (e._1, e._2, e._3)).zipWithIndex.foreach {
      case ((w, a, b), t) =>
        val (ra, rb) = (find(a), find(b))
        nodeA(t) = ra; nodeB(t) = rb; nodeD(t) = w
        setOf(ra) = n + t; setOf(rb) = n + t
    }
    val leafCount = new Array[Int](2 * n - 1)
    (0 until n).foreach(leafCount(_) = 1)
    (0 until n - 1).foreach(t => leafCount(n + t) = leafCount(nodeA(t)) + leafCount(nodeB(t)))
    def leaves(node: Int): Seq[Int] =
      if (node < n) Seq(node)
      else leaves(nodeA(node - n)) ++ leaves(nodeB(node - n))
    def lam(d: Double): Double = 1.0 / math.max(d, 1e-12)
    // condensed tree: clusters carry (birth λ, accumulated stability,
    // parent cluster, child clusters); each point records the deepest
    // cluster it fell out of
    val birth = scala.collection.mutable.ArrayBuffer[Double]()
    val stab = scala.collection.mutable.ArrayBuffer[Double]()
    val par = scala.collection.mutable.ArrayBuffer[Int]()
    val kids = scala.collection.mutable.ArrayBuffer[List[Int]]()
    val members = scala.collection.mutable.ArrayBuffer[List[Int]]()
    def newCluster(b: Double, parent: Int): Int = {
      birth += b; stab += 0.0; par += parent; kids += Nil; members += Nil
      if (parent >= 0) kids(parent) = (birth.length - 1) :: kids(parent)
      birth.length - 1
    }
    val rootCluster = newCluster(0.0, -1)
    def fallOut(node: Int, c: Int, l: Double): Unit =
      leaves(node).foreach { p =>
        stab(c) += l - birth(c)
        members(c) = p :: members(c)
      }
    def condense(node: Int, c: Int): Unit =
      if (node < n) fallOut(node, c, lam(0.0)) // singleton survives to λ→∞? no: mcs>=2 ⇒ unreachable
      else {
        val t = node - n
        val l = lam(nodeD(t))
        val (a, b) = (nodeA(t), nodeB(t))
        (leafCount(a) >= mcs, leafCount(b) >= mcs) match {
          case (true, true) => // real split: C ends here, two children born
            stab(c) += (l - birth(c)) * (leafCount(a) + leafCount(b))
            condense(a, newCluster(l, c))
            condense(b, newCluster(l, c))
          case (true, false) => fallOut(b, c, l); condense(a, c)
          case (false, true) => fallOut(a, c, l); condense(b, c)
          case (false, false) => fallOut(a, c, l); fallOut(b, c, l)
        }
      }
    condense(2 * n - 2, rootCluster)
    // excess-of-mass selection, children before parents (birth strictly
    // grows downward, so descending birth is a reverse topological order)
    val nc = birth.length
    val selected = Array.fill(nc)(false)
    val selStab = new Array[Double](nc)
    (0 until nc).sortBy(c => -birth(c)).foreach { c =>
      val childSum = kids(c).map(selStab).sum
      if (c != rootCluster && (kids(c).isEmpty || stab(c) > childSum)) {
        selected(c) = true
        selStab(c) = stab(c)
        // deselect every descendant
        def clear(x: Int): Unit = kids(x).foreach { k => selected(k) = false; clear(k) }
        clear(c)
      } else selStab(c) = math.max(stab(c), childSum)
    }
    // a point belongs to the selected ancestor (inclusive) of the
    // cluster it fell from, if any — selected clusters are an antichain
    val labels = Array.fill(n)(-1)
    (0 until nc).foreach { c =>
      var anc = c
      while (anc >= 0 && !selected(anc)) anc = par(anc)
      if (anc >= 0) members(c).foreach(labels(_) = anc)
    }
    val present = labels.toSeq.distinct.filter(_ >= 0)
      .sortBy(c => labels.indices.find(labels(_) == c).get)
    val dense = present.zipWithIndex.toMap
    labels.map(l => if (l < 0) -1 else dense(l))
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
    * in one call. The density family is the real [[hdbscan]] with k
    * as min_cluster_size (min_samples = k, the library default
    * coupling) — exactly the parameter the reference scans.
    * Determinism: ties resolve to the lexicographically
    * GREATEST algorithm name — concretely "kmedoids" > "density" >
    * "agglomerative" — then the SMALLER k. */
  def optimalClustersScan(dist: Array[Array[Double]],
                          ks: Seq[Int]): (String, Int, Array[Int], Double) =
    (for {
      (name, fit) <- Seq[(String, (Array[Array[Double]], Int) => Array[Int])](
        "agglomerative" -> (agglomerate(_, _)),
        "kmedoids" -> (kMedoids(_, _)),
        "density" -> ((d, k) => hdbscan(d, minClusterSize = k, minSamples = k)))
      k <- ks
    } yield {
      val labels = fit(dist, k)
      (name, k, labels, silhouette(dist, labels))
    }).maxBy { case (name, k, _, sil) => (sil, name, -k) }
}
