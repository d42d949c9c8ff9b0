package graft

import org.apache.spark.sql.DataFrame

/** Collect a TINY relation and re-emit it as a literal LocalRelation.
  *
  * Two distinct uses, both scale-safe because the input is KB-bounded
  * by construction:
  *  - consistency: every consumer provably shares one value set, with
  *    no reliance on exchange reuse, caching, or recompute determinism
  *    (the sketch-edge case — [[graft.operators.EraRank]]);
  *  - cost: a bounded sample derived from an expensive subtree (e.g.
  *    a corpus-wide sort-limit) would otherwise RE-EXECUTE that
  *    subtree once per consuming branch — Catalyst expands diamond
  *    plans, it does not memoize them. Freezing the 100-row result
  *    executes the derivation exactly once.
  *
  * Only for calendar/sample-bounded relations (per-era edge arrays,
  * the reference's own 100/1000-row statistic samples); anything
  * data-proportional must stay distributed. */
object Frozen {
  def copy(df: DataFrame): DataFrame = {
    val rows = df.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }
}
