package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (Jégou/Douze/Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — the scheme
  * FAISS's IVFPQ popularised): a d-dim vector splits into `m`
  * subvectors of `dsub` dims; each subvector is replaced by the index
  * of its nearest codebook centroid, so the stored row shrinks from
  * d floats to m small integers. Query time never reconstructs:
  * the query precomputes an m × k table of subspace distances ONCE
  * and each row's distance is m table lookups (asymmetric distance,
  * ADC).
  *
  * Both kernels are inner loops of a corpus scan, evaluated millions
  * of times — the same tier as [[DotProduct]]: native codegen'd
  * expressions calling one static JVM-visible helper (no UDF boxing,
  * no HOF interpretation, no per-row allocation beyond the code
  * array). Fold order is sequential left-to-right so every distance
  * is bit-reproducible against the DuckDB oracle.
  *
  * The codebook / lookup table ride along as expression fields
  * (driver-computed, tiny: m·k·dsub doubles ≤ a few hundred KB) and
  * reach generated code via `addReferenceObj` — broadcast with the
  * serialized plan, never re-derived per row.
  */
object PqExprs {

  /** Nearest-centroid code per subspace; ties keep the LOWEST
    * centroid index (the oracle's `ORDER BY d, cid` twin). Vector
    * elements beyond the array's length (or null elements) read as
    * 0.0. Returns m codes in [0, k). */
  def pqEncode(v: ArrayData, cb: Array[Double], m: Int, k: Int, dsub: Int): Array[Int] = {
    val n = v.numElements()
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (j * k + c) * dsub
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val idx = j * dsub + i
          val x = if (idx < n && !v.isNullAt(idx)) v.getDouble(idx) else 0.0
          val d = x - cb(base + i)
          acc += d * d
          i += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    out
  }

  /** ADC distance: sum of the query's precomputed subspace-distance
    * table entries at each stored code, j ascending (sequential adds
    * — bit-reproducible). Codes out of [0, k) or null contribute 0
    * (cannot happen for [[PqEncode]] output). */
  def pqAdc(codes: ArrayData, lut: Array[Double], k: Int): Double = {
    val m = math.min(codes.numElements(), lut.length / k)
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (!codes.isNullAt(j)) {
        val c = codes.getInt(j)
        if (c >= 0 && c < k) acc += lut(j * k + c)
      }
      j += 1
    }
    acc
  }
}

/** `array<double>` vector → `array<int>` of m PQ codes. */
case class PqEncode(child: Expression, codebook: Array[Double],
                    m: Int, k: Int, dsub: Int) extends UnaryExpression {

  require(codebook.length == m * k * dsub,
    s"codebook must hold m*k*dsub=${m * k * dsub} doubles, got ${codebook.length}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires array<double>, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(PqExprs.pqEncode(a.asInstanceOf[ArrayData], codebook, m, k, dsub))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebook", codebook, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |int[] $r = graft.functions.PqExprs.pqEncode($a, $cb, $m, $k, $dsub);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($r);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `array<int>` PQ codes → ADC distance against the query's m × k
  * lookup table. */
case class PqAdc(child: Expression, lut: Array[Double], k: Int)
  extends UnaryExpression {

  require(lut.length % k == 0, s"lut length ${lut.length} must be a multiple of k=$k")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc requires array<int> codes, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any =
    PqExprs.pqAdc(a.asInstanceOf[ArrayData], lut, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lut, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PqExprs.pqAdc($a, $lutRef, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
