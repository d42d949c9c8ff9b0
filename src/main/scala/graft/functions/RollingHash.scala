package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin rolling hash of a string column as a native Catalyst
  * expression with whole-stage codegen — the document-fingerprinting
  * kernel (north star "document fingerprinting (rolling hash)"),
  * demonstrating the custom-`Expression` extension path (SURVEY §2.11:
  * prefer native expressions over Scala UDFs; codegen keeps it inside
  * the WholeStageCodegen span on a 100 TB scan).
  *
  * h = Σ bytes b_i: h*257 + b_i (mod 1e9+7), over UTF-8 bytes.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $b = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  $h = ($h * 257L + ($b[$i] & 0xffL)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Reference implementation (shared by eval and tests). */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 257L + (bytes(i) & 0xffL)) % 1000000007L
      i += 1
    }
    h
  }

  /** Column API: `rolling_hash(text)`. */
  def rolling_hash(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnBridge
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))
  }
}
