package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE-style change application over plain parquet relations — the
  * warehouse upsert/delete surface (engine-new; no table format
  * required). Semantics follow SQL MERGE with row-level replacement:
  *
  *  - a change row whose key matches a target row REPLACES that row
  *    entirely (not field-patching);
  *  - a change row with no match is an INSERT;
  *  - a delete marker removes the target row (absent keys are no-ops).
  *
  * Scale shape: one shuffle join keyed on the merge key (or zero with
  * write-side bucketing on the key — [[Bucketing]]); the change set in
  * a CDC batch is orders of magnitude smaller than the target, so
  * Spark's planner broadcasts it when small. Deterministic: no
  * last-writer ambiguity because [[applyChanges]] requires the change
  * set to be key-unique (duplicate change keys would make MERGE
  * nondeterministic — same rule ANSI MERGE enforces with its
  * "cardinality violation" error).
  */
object MergeOps {

  /** Row-level upsert: `updates` rows replace same-key `target` rows
    * and insert otherwise. Column sets must match; output keeps the
    * target's column order. */
  def upsert(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(target.columns.sorted.sameElements(updates.columns.sorted),
      s"column mismatch: ${target.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val cols = target.columns.toSeq
    val marked = updates
      .select(col(key) +: cols.filterNot(_ == key)
        .map(c => col(c).as(s"__u_$c")): _*)
      .withColumn("__upd", lit(true))
    target.join(marked, Seq(key), "full_outer")
      .select(cols.map { c =>
        val out: Column =
          if (c == key) col(key)
          // row-level replace: every update column wins when the
          // update row exists, even if its value is null
          else when(col("__upd").isNotNull, col(s"__u_$c")).otherwise(col(c))
        out.as(c)
      }: _*)
  }

  /** Apply a CDC batch: `changes` carries the target's columns plus
    * `opCol` ∈ {'U','D'} — upsert or delete. Change keys must be
    * unique per batch (caller contract — the ANSI MERGE cardinality
    * rule; a duplicate key would fan out the join and duplicate the
    * row, which `MergeSpec` pins as the observable misuse signal). */
  def applyChanges(target: DataFrame, changes: DataFrame, key: String,
                   opCol: String = "op"): DataFrame = {
    val dels = changes.filter(col(opCol) === "D").select(col(key))
    val ups = changes.filter(col(opCol) === "U").drop(opCol)
    val kept = target.join(dels, Seq(key), "left_anti")
    upsert(kept, ups, key)
  }
}
