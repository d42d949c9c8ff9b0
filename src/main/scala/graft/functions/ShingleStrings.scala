package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingle STRINGS of a text column as one fused native
  * kernel — the string twin of [[ShingleHash]] for consumers that
  * need the text itself (vocabulary building, boilerplate listing)
  * rather than a hash. Same word-boundary semantics as
  * `split(text, " ")` (empty words from consecutive spaces included),
  * windows joined by single spaces; replaces the
  * transform+slice+concat_ws higher-order chain (CodegenFallback,
  * three intermediate arrays per document) with a single byte-level
  * pass. Each shingle is a copy of the original byte range, so no
  * per-word string objects are allocated at all.
  */
case class ShingleStrings(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"shingle size must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleStrings.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleStrings.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

object ShingleStrings {

  /** One pass over the UTF-8 bytes: the i-th shingle is the byte
    * range from the start of word i to the end of word i+n-1 — when
    * separators are single spaces (they are, by the split contract),
    * that range IS the n words joined by single spaces. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    var nWords = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    if (nWords < n) return new GenericArrayData(Array.empty[AnyRef])
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
    val out = new Array[AnyRef](nWords - n + 1)
    var s = 0
    while (s <= nWords - n) {
      val from = starts(s)
      val until = ends(s + n - 1)
      out(s) = UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, from, until))
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `shingle_strings(text, n)`. */
  def shingle_strings(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(ShingleStrings(ColumnBridge.expression(c), n))
  }
}
