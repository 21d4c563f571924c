package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.BigInteger

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Accumulator for [[GramSumsAgg]]: exact integer sums of the
  * grid-quantized first moments (d cells) and upper-triangular
  * pairwise products (d(d+1)/2 cells). Cells accumulate in a LONG
  * array on the hot path; any cell about to overflow promotes the
  * whole buffer into a lazily-allocated BigInteger side array and
  * keeps going — so the sums stay EXACT at any corpus size (the
  * decimal(38,0) guarantee of the explode formulation) while the
  * per-row cost stays a primitive add. For unit-scale embeddings
  * (|x| ≤ ~1 ⇒ grid values ≤ ~1e6, products ≤ ~1e12) a long absorbs
  * ~9e6 rows between promotions. */
final class GramBuffer(val dim: Int) {
  val pairs: Int = dim * (dim + 1) / 2
  var n: Long = 0L
  val longs: Array[Long] = new Array[Long](dim + pairs)
  var big: Array[BigInteger] = null

  def promote(): Unit = {
    if (big == null) big = Array.fill(dim + pairs)(BigInteger.ZERO)
    var i = 0
    while (i < longs.length) {
      if (longs(i) != 0L) {
        big(i) = big(i).add(BigInteger.valueOf(longs(i)))
        longs(i) = 0L
      }
      i += 1
    }
  }

  def add(idx: Int, v: Long): Unit =
    try longs(idx) = Math.addExact(longs(idx), v)
    catch { case _: ArithmeticException =>
      promote()
      longs(idx) = v
    }

  /** Exact cell value (long part + promoted part). */
  def total(idx: Int): BigInteger = {
    val l = BigInteger.valueOf(longs(idx))
    if (big == null) l else big(idx).add(l)
  }
}

/** One-pass PCA sufficient statistics as a SINGLE aggregation with a
  * primitive-loop kernel — the fused twin of `Pca.covarianceStats`'s
  * explode formulation (VERDICT r14 perf list: embedding_covariance
  * was the #4 bench line; the explode built d(d+1)/2 + d interpreted
  * HOF structs PER ROW — 2,144 at d=64 — before the keyed agg could
  * collapse them). The kernel does the identical arithmetic per row:
  * quantize each coordinate to the 1e-6 grid with EXACTLY Spark's
  * `cast(round(x·1e6) as bigint)` semantics (BigDecimal HALF_UP on
  * the decimal rendering — `Math.round`'s floor(x+0.5) differs on
  * ties and on 0.49999999999999994), then one tight i ≤ j loop of
  * exact integer adds. Partial buffers merge by exact cell addition,
  * so the output integers are identical in any partitioning — and
  * identical to the explode formulation, which PcaSpec pins.
  *
  * Output layout (ArrayType(DecimalType(38,0))): element 1 = n,
  * elements 2..d+1 = first moments, then the upper triangle
  * row-major — cell (i, j) at `d + 2 + i·d − i(i−1)/2 + (j − i)`
  * (1-based `element_at` positions).
  *
  * Buffer: (d + d(d+1)/2) longs (~17 KB at d=64) per group per
  * partition, plus the BigInteger side array only after a promotion.
  * Grid PRODUCTS must fit a long (|x| ≤ ~3e3 — any embedding scale);
  * `multiplyExact` turns silent wrap into a loud error. */
case class GramSumsAgg(
    vec: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] {

  require(dim > 0, s"dim must be > 0, got $dim")

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DecimalType(38, 0), containsNull = false)

  override def createAggregationBuffer(): GramBuffer = new GramBuffer(dim)

  private def grid(x: Double): Long = {
    // Fail loudly on garbage embeddings (ADVICE r15): BigDecimal
    // .valueOf would throw a raw NumberFormatException on NaN/Inf;
    // the prior explode formulation silently cast them to 0 (Spark's
    // cast(round(NaN) as bigint)) — neither is what a pipeline wants.
    require(java.lang.Double.isFinite(x),
      s"GramSumsAgg: non-finite vector element $x — clean the " +
        "embedding column (NaN/Infinity) before covariance")
    java.math.BigDecimal.valueOf(x * 1000000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
  }

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val v = vec.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"expected $dim-dim vector, got ${arr.numElements()}")
      val q = new Array[Long](dim)
      var i = 0
      while (i < dim) { q(i) = grid(arr.getDouble(i)); i += 1 }
      buf.n += 1
      var idx = dim
      i = 0
      while (i < dim) {
        buf.add(i, q(i))
        var j = i
        while (j < dim) {
          buf.add(idx, Math.multiplyExact(q(i), q(j)))
          idx += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: GramBuffer, b: GramBuffer): GramBuffer = {
    a.n += b.n
    if (b.big != null) {
      if (a.big == null) a.promote()
      var i = 0
      while (i < a.big.length) { a.big(i) = a.big(i).add(b.big(i)); i += 1 }
    }
    var i = 0
    while (i < a.longs.length) { a.add(i, b.longs(i)); i += 1 }
    a
  }

  override def eval(buf: GramBuffer): Any = {
    val out = new Array[Any](1 + buf.longs.length)
    out(0) = org.apache.spark.sql.types.Decimal(BigDecimal(buf.n), 38, 0)
    var i = 0
    while (i < buf.longs.length) {
      out(i + 1) =
        org.apache.spark.sql.types.Decimal(BigDecimal(buf.total(i)), 38, 0)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: GramBuffer): Array[Byte] = {
    buf.promote()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    var i = 0
    while (i < buf.big.length) {
      val bytes = buf.big(i).toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new GramBuffer(dim)
    buf.n = in.readLong()
    buf.big = new Array[BigInteger](dim + buf.pairs)
    var i = 0
    while (i < buf.big.length) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.big(i) = new BigInteger(b)
      i += 1
    }
    buf
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramSumsAgg =
    copy(vec = newChildren(0))

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSumsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSumsAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "gram_sums"
}

object GramSumsAgg {
  def gramSums(vec: Column, dim: Int): Column =
    GraftBridge.toColumn(
      GramSumsAgg(GraftBridge.toExpression(vec), dim).toAggregateExpression())
}
