package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst sketch expressions over pre-hashed token arrays.
  *
  * The HOF `aggregate` formulations are semantically identical but run
  * interpreted (CodegenFallback) and cost tokens x bits lambda
  * invocations per row; these compile to tight primitive loops. Both
  * consume `array<long>` of md5-derived token/shingle hashes (see
  * Dedup.hash64) so determinism and oracle parity are unchanged.
  */

/** 60-bit SimHash of a token-hash array: bit i of the result is set
  * when `sum over tokens of (bit_i(h) ? 1 : -1)` is positive. */
case class SimHashAgg(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](60)
    var t = 0
    while (t < n) {
      if (!hs.isNullAt(t)) {
        val h = hs.getLong(t)
        var i = 0
        while (i < 60) {
          if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var sim = 0L
    var i = 0
    while (i < 60) {
      if (counts(i) > 0) sim |= (1L << i)
      i += 1
    }
    sim
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val sim = ctx.freshName("sim")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[60];
         |for (int $t = 0; $t < $n; $t++) {
         |  if (!$a.isNullAt($t)) {
         |    long $h = $a.getLong($t);
         |    for (int $i = 0; $i < 60; $i++) {
         |      if ((($h >>> $i) & 1L) == 1L) $counts[$i]++; else $counts[$i]--;
         |    }
         |  }
         |}
         |long $sim = 0L;
         |for (int $i = 0; $i < 60; $i++) {
         |  if ($counts[$i] > 0) $sim |= (1L << $i);
         |}
         |${ev.value} = $sim;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature of a shingle-hash array under the universal-hash
  * family sig_j = min over h of (a_j * (h mod m) + b_j) mod m.
  * Input hashes must already be reduced mod m (Dedup pre-reduces). */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], m: Long)
  extends UnaryExpression {

  private val k = as.length
  require(bs.length == k, "a/b constant arrays must have equal length")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = Array.fill(k)(m)
    var t = 0
    while (t < n) {
      if (!hs.isNullAt(t)) {
        val h = hs.getLong(t)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % m
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as.toArray, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs.toArray, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, ${m}L);
         |for (int $t = 0; $t < $n; $t++) {
         |  if (!$a.isNullAt($t)) {
         |    long $h = $a.getLong($t);
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ($asRef[$j] * $h + $bsRef[$j]) % ${m}L;
         |      if ($v < $sig[$j]) $sig[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchExprs {
  def simhash(tokenHashes: Column): Column =
    GraftBridge.toColumn(SimHashAgg(GraftBridge.toExpression(tokenHashes)))

  def minhashSig(shingleHashes: Column, as: Seq[Long], bs: Seq[Long], m: Long): Column =
    GraftBridge.toColumn(MinHashSig(GraftBridge.toExpression(shingleHashes), as, bs, m))
}
