package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Seeded Bernoulli sampling as a deterministic key-hash predicate —
  * the library's T4 surface (`#cell-7`'s `num_x.sample(n=...)`).
  *
  * `rand(seed)` streams are engine-specific: they depend on partition
  * layout, so the "same" seeded sample silently changes when AQE
  * re-splits a 100 TB scan, and no other engine can reproduce the
  * membership. The library therefore DEFINES its seeded sample as a
  * key hash — md5(seed#key) taken as 60 bits, mod 10 000, kept below
  * fraction·10 000 (the shingle-hash convention the dedup oracles
  * use). Properties that matter at scale:
  *
  *  - membership is a pure function of (seed, key): reproducible in
  *    any engine, stable under repartitioning, re-runs, and AQE;
  *  - the predicate is a scan-local codegen'd filter — no shuffle, no
  *    count() pre-pass, no driver collect;
  *  - disjoint seeds give independent samples; the same seed gives
  *    nested samples as the fraction grows (threshold monotonicity).
  */
object Sampling {

  /** `fraction` as a per-10k hash threshold, floored at 1 so a tiny
    * positive fraction never degenerates to an always-false predicate. */
  def per10k(fraction: Double): Long =
    math.max(1L, math.round(fraction * 10000))

  /** Keep rows whose key hashes below `fraction` — deterministic,
    * engine-reproducible seeded Bernoulli sample on a unique key. */
  def seededBernoulli(df: DataFrame, key: Column, fraction: Double,
                      seed: Long): DataFrame =
    if (fraction >= 1.0) df
    else df.filter(
      pmod(TextOps.hash60(concat_ws("#", lit(s"seed$seed"), key)),
        lit(10000L)) < lit(per10k(fraction)))
}
