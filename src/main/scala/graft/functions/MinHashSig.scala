package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The 16-component MinHash signature of a document as ONE fused
  * native kernel: shingle hashes from [[ShingleHash.compute]] reduced
  * to min((h mod p) * (2j+1) mod p) per hash-family index j — all
  * minima tracked in a single pass over the shingles.
  *
  * The signature is DOC-LOCAL (a min never needs the distinct step or
  * a shuffle), so this replaces the explode(shingles) → groupBy(doc)
  * 16-min-column aggregation — which shuffled every shingle hash —
  * with a scan-local expression: at any scale the only shuffled
  * relation left in MinHash-LSH is (doc_id, band, signature).
  * Equal to the agg composition because min over the hash multiset
  * equals min over the distinct set (duplicates cannot change a min).
  *
  * Empty result (fewer words than the shingle size) stays an empty
  * array; callers filter it out, reproducing the groupBy's absent-row
  * behavior. Codegen is the same StaticInvoke pattern as
  * [[ShingleHash]].
  */
case class MinHashSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {
  require(n > 0 && numHashes > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $n, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** [[MinHashSig]] over an ALREADY-HASHED shingle array — the min
  * reduction alone, for pipelines that compute
  * [[ShingleHash.shingle_hash60]] once and feed several consumers
  * (the shared-table build hashes the corpus once for the jaccard,
  * minhash and winnow indexes — r18). `minhash_from_hashes(
  * shingle_hash60(text, n), k)` is IDENTICAL to
  * `minhash_sig(text, n, k)` by construction: [[MinHashSig.compute]]
  * delegates to the same [[MinHashSig.fromHashes]] reduction. */
case class MinHashFromHashes(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.fromHashes(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.fromHashes($c, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes =
    copy(child = newChild)
}

object MinHashSig {

  val P: Long = 2147483647L

  /** Empty array when the doc has fewer than `n` words, else the
    * `numHashes` minima over h_j(x) = ((x mod P) * (2j+1)) mod P. */
  def compute(text: UTF8String, n: Int, numHashes: Int): ArrayData =
    fromHashes(ShingleHash.compute(text, n), numHashes)

  /** The min reduction over a shingle-hash array — the shared core of
    * [[compute]] and [[MinHashFromHashes]]. */
  def fromHashes(sh: ArrayData, numHashes: Int): ArrayData = {
    val m = sh.numElements()
    if (m == 0) return new GenericArrayData(Array.empty[Long])
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = sh.getLong(i) % P
      var j = 0
      while (j < numHashes) {
        val v = (h * (2 * j + 1)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Column API: `minhash_sig(text, n, numHashes)`. */
  def minhash_sig(c: Column, n: Int, numHashes: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), n, numHashes))
  }

  /** Column API: `minhash_from_hashes(hashes, numHashes)`. */
  def minhash_from_hashes(c: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(MinHashFromHashes(ColumnBridge.expression(c), numHashes))
  }
}
