package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the transitive
  * closure a real dedup pipeline needs: near-dup PAIRS must become
  * CLUSTERS (a~b, b~c => {a,b,c}) so exactly one representative per
  * cluster survives, not per pair.
  *
  * Min-label propagation in relational form: every node starts
  * labelled with its own id; each round every node takes the minimum
  * label among itself and its neighbours; at fixpoint the label is
  * the component's minimum node id. Each round is one shuffle join on
  * the edge relation — the standard scale shape (label propagation /
  * small-star family): rounds = graph diameter, and near-dup graphs
  * are shallow (clusters of copies, not long chains). The driver
  * only runs the loop; labels never collect.
  */
object ConnectedComponents {

  /** (a, b) edge list -> (id, rep) for every node appearing in an
    * edge, rep = min node id of its component. Throws if the graph
    * has not converged within `maxIter` rounds (a silent partial
    * closure would under-merge clusters).
    *
    * The returned relation is PERSISTED (each round materializes on
    * the previous one; an unpersisted result would re-run the whole
    * propagation with exponentially nested lineage on every action) —
    * callers that keep the session alive should `unpersist()` it when
    * done; harness runs clear the cache per query. */
  def labels(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    require(maxIter > 0, s"maxIter must be positive, got $maxIter")
    val sym = edges.select(col("a").as("v"), col("b").as("u"))
      .union(edges.select(col("b").as("v"), col("a").as("u")))
      .persist()
    var lab = sym.select(col("v")).distinct()
      .withColumn("l", col("v")).persist()
    try {
      var round = 0
      while (round < maxIter) {
        val viaNeighbor = sym
          .join(lab.select(col("v").as("u"), col("l")), "u")
          .select(col("v"), col("l"))
        // persist truncates recomputation but the LOGICAL plan still
        // nests one join per round; localCheckpoint every 8 rounds cuts
        // the lineage so analyzer/optimizer time stays flat on
        // high-diameter graphs (near-dup graphs are shallow, but a
        // 20+-round path must not pay quadratic plan analysis)
        val next0 = lab.select(col("v"), col("l")).union(viaNeighbor)
          .groupBy(col("v")).agg(min(col("l")).as("l"))
        // KNOWN BOUNDED LEAK: when `next` is the every-8th-round
        // localCheckpoint, the later lab.unpersist() is a
        // CacheManager no-op (checkpoint blocks bypass it), so those
        // blocks linger until RDD GC — ≤ maxIter/8 label-table copies,
        // MEMORY_AND_DISK. Deliberately accepted: force-unpersisting a
        // checkpointed RDD destroys its only copy (lineage is
        // truncated — nothing can recompute it), so an eviction or
        // late re-action on a derived frame would fail instead of
        // recompute. Driver GC reclaims the handles between queries.
        val next =
          if (round % 8 == 7) next0.localCheckpoint() else next0.persist()
        val changed = next
          .join(lab.select(col("v"), col("l").as("l0")), "v")
          .filter(col("l") < col("l0"))
          .limit(1).count()
        lab.unpersist()
        lab = next
        if (changed == 0) return lab.select(col("v").as("id"), col("l").as("rep"))
        round += 1
      }
      lab.unpersist()
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")
    } finally sym.unpersist()
  }
}
