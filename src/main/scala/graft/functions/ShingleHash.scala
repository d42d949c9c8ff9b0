package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingle hashes of a string column as ONE fused native
  * kernel: split on single spaces, md5 each n-word window (words
  * joined by a single space — identical to the
  * `concat_ws(" ", slice(split(text, " "), i, n))` composition,
  * including empty words from consecutive spaces), keep the top 60
  * bits. Replaces a transform+slice+concat_ws+md5 higher-order chain
  * that allocated three intermediate arrays per document and
  * interpreted its lambdas per element (HOFs are CodegenFallback).
  *
  * hash60 parity: `conv(substring(md5(s),1,15),16,10)` is the first
  * 15 hex nibbles of the digest read big-endian = (first 8 digest
  * bytes as unsigned BE) >>> 4 — pinned equal to the composition by
  * ShingleHashSpec, and to DuckDB's
  * `('0x' || substr(md5(s),1,15))::BIGINT` by the dedup oracles.
  *
  * Codegen emits a static call to [[ShingleHash.compute]] — the loop
  * stays inside the WholeStageCodegen span with no virtual
  * Expression dispatch (the StaticInvoke pattern).
  */
case class ShingleHash(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"shingle size must be positive, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHash.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHash.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

object ShingleHash {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Single pass over the UTF-8 bytes: word boundaries at 0x20 (the
    * same boundaries `split(text, " ")` produces, empty words
    * included), one md5 per n-word window over the ORIGINAL byte
    * slices joined by ' '. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // word boundaries: starts(i) .. ends(i) exclusive
    var nWords = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    val starts = new Array[Int](nWords)
    val ends = new Array[Int](nWords)
    var w = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = bytes.length
    if (nWords < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](nWords - n + 1)
    val d = md5.get()
    var s = 0
    while (s <= nWords - n) {
      d.reset()
      // the n-word window joined by single spaces is exactly the
      // original byte range when the separators are single spaces —
      // but consecutive spaces yield empty words, so feed word slices
      // and explicit separators rather than the raw range
      var k = 0
      while (k < n) {
        if (k > 0) d.update(' '.toByte)
        d.update(bytes, starts(s + k), ends(s + k) - starts(s + k))
        k += 1
      }
      val dig = d.digest()
      // first 15 hex nibbles big-endian = unsigned BE of bytes 0..7 >>> 4
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
      out(s) = v >>> 4
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `shingle_hash60(text, n)`. */
  def shingle_hash60(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(ShingleHash(ColumnBridge.expression(c), n))
  }
}
