package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** All `bands` sign-LSH band signatures of an embedding as ONE fused
  * native kernel (the [[MinHashSig]] treatment for the embedding
  * family): band b's bit j is the sign of <v, w_(b*64+j)> over the
  * scrambled-hash hyperplane family
  * w_q(pos) = (((pos*1000003 + q) * 2654435761) mod 2^32) mod 7 - 3
  * (pos is 1-based; see `SimilarityPack.planeW` for why the family
  * must be non-linear mod 7 — the r12 30x probe caught the linear
  * family capping at 49 distinct planes and going quadratic).
  *
  * One pass over the vector accumulates every (band, bit) dot
  * product — replacing `bands*bits` separate aggregate(zip_with(...))
  * lambda expressions whose analyzer/codegen cost alone dominated the
  * banded near-dup at fixture scale. Accumulation order over vector
  * positions is ascending, matching both the lambda composition and
  * the DuckDB oracle's per-vector unnest order, so the emitted signs
  * are bit-identical. The signature is ROW-LOCAL: at any scale the
  * only shuffled relation in the banded near-dup is
  * (vec_id, band, signature).
  */
case class SignLshSig(child: Expression, bits: Int, bands: Int)
    extends UnaryExpression {
  require(bits > 0 && bits <= 63 && bands > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SignLshSig.compute(input.asInstanceOf[ArrayData], bits, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SignLshSig.compute($c, $bits, $bands);")

  override protected def withNewChildInternal(newChild: Expression): SignLshSig =
    copy(child = newChild)
}

object SignLshSig {

  /** w_q(pos), pos 1-based, computed mod-2^32-exactly for ANY vector
    * length up to the JVM array bound: both multiplies reduce mod 2^32
    * by masking, and (a*b) wrapped mod 2^64 preserves the low 32 bits,
    * so the masked product IS ((pos*1000003+q)*2654435761) mod 2^32
    * even where the naive Long product would overflow. (The naive
    * form stays in Long only to pos ~3.4e3 — (3470*1000003 + 256) *
    * 2654435761 ~ 9.2e18 is the Long ceiling, NOT the ~64k a previous
    * comment claimed — and past it `%` on the wrapped NEGATIVE value
    * silently diverges from the spec.) The DuckDB oracles replay the
    * naive BIGINT form, exact over the same pos <= ~3.4e3 domain and
    * a loud overflow ERROR (never silent divergence) beyond it; the
    * fixture embeddings are 64-dim. */
  def planeWeight(pos: Long, q: Long): Long =
    ((((pos * 1000003L + q) & 0xFFFFFFFFL) * 2654435761L) & 0xFFFFFFFFL) % 7L - 3L

  /** Array of `bands` bucket ids for a double-array vector. */
  def compute(v: ArrayData, bits: Int, bands: Int): ArrayData = {
    val n = v.numElements()
    val dots = new Array[Double](bands * bits)
    var p = 0
    while (p < n) {
      val x = v.getDouble(p)
      var b = 0
      while (b < bands) {
        var j = 0
        while (j < bits) {
          dots(b * bits + j) += x * planeWeight(p + 1, b * 64L + j)
          j += 1
        }
        b += 1
      }
      p += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var j = 0
      while (j < bits) {
        if (dots(b * bits + j) > 0) sig |= (1L << j)
        j += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `sign_lsh_sig(v, bits, bands)` — v: array<double>. */
  def sign_lsh_sig(c: Column, bits: Int, bands: Int): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(SignLshSig(ColumnBridge.expression(c), bits, bands))
  }
}
