package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Every `stride`-th byte of a binary column, starting at byte 0 —
  * the frame-subsampling access pattern over an opaque media payload.
  * Operates on RAW BYTES end to end: the string/regex formulation it
  * replaces round-tripped through UTF-8 and corrupted any non-text
  * payload (real media bytes are not valid UTF-8). */
case class ByteStride(child: Expression, stride: Int)
  extends UnaryExpression {

  require(stride >= 1, s"stride must be >= 1, got $stride")

  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any): Any = {
    val in = a.asInstanceOf[Array[Byte]]
    val out = new Array[Byte]((in.length + stride - 1) / stride)
    var i = 0
    while (i < out.length) {
      out(i) = in(i * stride)
      i += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |byte[] $out = new byte[($a.length + $stride - 1) / $stride];
         |for (int $i = 0; $i < $out.length; $i++) {
         |  $out[$i] = $a[$i * $stride];
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BinaryExprs {
  def byteStride(bin: Column, stride: Int): Column =
    GraftBridge.toColumn(ByteStride(GraftBridge.toExpression(bin), stride))
}
