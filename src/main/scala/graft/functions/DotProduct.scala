package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst dot product over two array<double> columns.
  *
  * The built-in formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * is semantically identical but runs interpreted (higher-order
  * functions are CodegenFallback) and allocates an intermediate array
  * per row. This expression codegens to a tight primitive loop — no
  * allocation, no virtual calls — which matters when a kNN scan
  * evaluates it millions of times. Fold order is the same sequential
  * left-to-right, so results are bit-identical with the HOF path (and
  * the DuckDB oracle).
  *
  * Null semantics: null if either array is null; null elements are
  * treated as 0 contribution (vectors from parquet are non-null).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd squared L2 distance — same tight-loop rationale as
  * [[DotProduct]]; fold order matches `list_distance`'s sequential
  * accumulation so `sqrt` of this is oracle-bit-identical. */
case class L2DistanceSq(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val d = x.getDouble(i) - y.getDouble(i)
        acc += d * d
      }
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd single-pass L2 normalization. The HOF formulation
  * `transform(v, x => x / norm)` INLINES the norm expression into the
  * lambda, so Catalyst recomputes the full dot product per element —
  * O(d²) per row. This expression computes the norm once and emits
  * the scaled array in one pass; zero vectors pass through unchanged
  * (reference: lshtree.go:10-28 normalizeVector). */
case class L2Normalize(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) { val v = x.getDouble(i); acc += v * v }
      i += 1
    }
    val nrm = math.sqrt(acc)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      val v = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      out(i) = if (nrm == 0.0) v else v / nrm
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nrm = ctx.freshName("nrm")
      val out = ctx.freshName("out")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $v = $a.getDouble($i);
         |    $acc += $v * $v;
         |  }
         |}
         |double $nrm = java.lang.Math.sqrt($acc);
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |  $out[$i] = ($nrm == 0.0) ? $v : $v / $nrm;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DotProduct {
  /** Column API: codegen'd dot product of two vector columns (cast to
    * array<double> by the caller or implicitly here). */
  def dot(a: Column, b: Column): Column =
    GraftBridge.toColumn(DotProduct(
      GraftBridge.toExpression(a.cast("array<double>")),
      GraftBridge.toExpression(b.cast("array<double>"))))

  def l2Sq(a: Column, b: Column): Column =
    GraftBridge.toColumn(L2DistanceSq(
      GraftBridge.toExpression(a.cast("array<double>")),
      GraftBridge.toExpression(b.cast("array<double>"))))

  def l2normalize(a: Column): Column =
    GraftBridge.toColumn(L2Normalize(
      GraftBridge.toExpression(a.cast("array<double>"))))
}
