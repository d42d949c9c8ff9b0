package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 48-bit SimHash of a string column as ONE fused native kernel: split
  * on single spaces (empty words from consecutive spaces included,
  * matching `split(text, " ")`), hash60 each word occurrence, vote
  * every bit +1/-1, emit the sign vector as a long.
  *
  * The signature is DOC-LOCAL, so this replaces the
  * explode(words) → 48-column vote aggregation pipeline — which
  * shuffled every word hash through a partial+final agg — with a
  * scan-local expression: at any scale the signature costs zero
  * shuffle, and the only shuffled relation is (doc_id, band) for the
  * banding join. Bit-for-bit identical to the vote-column composition
  * (pinned by ShingleHashSpec): bit j set iff
  * sum over word occurrences of (+1 if (hash60(w) >> j) & 1 else -1)
  * is positive.
  *
  * Codegen emits a static call to [[SimHash.compute]] — the word loop
  * stays inside the WholeStageCodegen span (the StaticInvoke pattern,
  * same as [[ShingleHash]]).
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHash.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One pass over the UTF-8 bytes: per word occurrence, hash60 (first
    * 15 hex nibbles of md5 = first 8 digest bytes unsigned BE >>> 4),
    * then +1/-1 votes on bits 0..47; signature bit set iff the vote
    * sum is positive. */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val votes = new Array[Int](48)
    val d = md5.get()
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        d.reset()
        d.update(bytes, start, i - start)
        val dig = d.digest()
        var v = 0L
        var b = 0
        while (b < 8) { v = (v << 8) | (dig(b) & 0xffL); b += 1 }
        v = v >>> 4
        var j = 0
        while (j < 48) {
          if (((v >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 48) { if (votes(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  /** Column API: `sim_hash48(text)`. */
  def sim_hash48(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(SimHash(ColumnBridge.expression(c)))
  }
}
