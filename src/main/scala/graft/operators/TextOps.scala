package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface
  * (BASELINE.json north star): shingling, content hashing, token
  * metrics. All pure Catalyst expressions — codegen'd, no UDFs — so
  * they stay inside whole-stage codegen on a 100 TB scan.
  */
object TextOps {

  /** 60-bit deterministic content hash: first 15 hex digits of md5,
    * parsed base-16. Engine-portable (DuckDB:
    * `('0x' || substr(md5(x),1,15))::BIGINT`), collision rate fine for
    * dedup candidate generation at trillions of docs (60 bits). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokenization (single-space corpus). */
  def words(text: Column): Column = split(text, " ")

  /** Word n-gram shingles as an array column; empty when the doc has
    * fewer than n words (guards `sequence`'s descending-range gotcha). */
  def shingles(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Canonical-form document fingerprint: lowercase, collapse runs of
    * whitespace, trim, then [[hash60]] (rolling-hash-style content id). */
  def fingerprint(text: Column): Column =
    hash60(trim(lower(regexp_replace(text, "\\s+", " "))))
}
