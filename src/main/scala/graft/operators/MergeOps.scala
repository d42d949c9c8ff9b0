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

  /** The merge internals fabricate `__`-prefixed helper columns
    * (`__u_*`, `__upd`, `__o_*`, `__n_*`, `__in_o`, `__in_n`); an
    * input that legitimately carries such a name would collide with
    * them and silently corrupt the merge, so it is rejected up front. */
  private def requireNoReservedCols(df: DataFrame, what: String): Unit = {
    val bad = df.columns.filter(_.startsWith("__"))
    require(bad.isEmpty,
      s"$what columns ${bad.mkString(",")} use the reserved '__' prefix " +
        "(internal merge helper namespace)")
  }

  /** Row-level upsert: `updates` rows replace same-key `target` rows
    * and insert otherwise. Column sets must match; output keeps the
    * target's column order. */
  def upsert(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    require(target.columns.sorted.sameElements(updates.columns.sorted),
      s"column mismatch: ${target.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    requireNoReservedCols(target, "target")
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
    * `opCol` — 'D' deletes by key; everything else ('U' update, 'I'
    * insert — both are upserts, the distinction is informational) is
    * applied by [[upsert]]. Change keys must be unique per batch
    * (caller contract — the ANSI MERGE cardinality rule; a duplicate
    * key would fan out the join and duplicate the row, which
    * `MergeSpec` pins as the observable misuse signal). */
  def applyChanges(target: DataFrame, changes: DataFrame, key: String,
                   opCol: String = "op"): DataFrame = {
    val dels = changes.filter(col(opCol) === "D").select(col(key))
    val ups = changes.filter(col(opCol) =!= "D").drop(opCol)
    val kept = target.join(dels, Seq(key), "left_anti")
    upsert(kept, ups, key)
  }

  /** The inverse of [[applyChanges]]: CDC GENERATION by snapshot diff.
    * Emits one change row per differing key — `'D'` (old image) for
    * keys absent from `next`, `'I'` (new image) for keys absent from
    * `prev`, `'U'` (new image) for keys whose row changed under
    * null-safe column equality; unchanged keys emit nothing, so the
    * batch is minimal. Round-trip law (pinned in `MergeSpec`):
    * `applyChanges(prev, diff(prev, next)) == next` as a multiset.
    * One keyed full-outer join — same scale shape as the apply side. */
  def diff(prev: DataFrame, next: DataFrame, key: String,
           opCol: String = "op"): DataFrame = {
    require(prev.columns.sorted.sameElements(next.columns.sorted),
      s"column mismatch: ${prev.columns.mkString(",")} vs ${next.columns.mkString(",")}")
    requireNoReservedCols(prev, "prev")
    val cols = prev.columns.toSeq
    val rest = cols.filterNot(_ == key)
    val o = prev.select(col(key) +: rest.map(c => col(c).as(s"__o_$c")): _*)
      .withColumn("__in_o", lit(true))
    val n = next.select(col(key) +: rest.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__in_n", lit(true))
    val changed = rest.map(c => !(col(s"__o_$c") <=> col(s"__n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, Seq(key), "full_outer")
      .withColumn(opCol,
        when(col("__in_n").isNull, "D")
          .when(col("__in_o").isNull, "I")
          .when(changed, "U"))
      .filter(col(opCol).isNotNull)
      .select(cols.map { c =>
        val out: Column =
          if (c == key) col(key)
          // D carries the old image (informative); I/U the new one
          else when(col(opCol) === "D", col(s"__o_$c")).otherwise(col(s"__n_$c"))
        out.as(c)
      } :+ col(opCol): _*)
  }
}
