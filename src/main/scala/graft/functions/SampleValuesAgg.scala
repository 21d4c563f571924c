package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Deterministic fixed-size VALUE sample: keeps the values whose rank
  * hash is among the k smallest (distinct hashes), and returns them
  * sorted BY VALUE ascending — the one-pass buffer behind reproducible
  * sampled quantiles.
  *
  * Like [[KmvAgg]] the k-min-hash set is order-insensitive, so the
  * sample — and every quantile read off it — is bit-identical across
  * runs, partitionings, engines, and batch/streaming execution (the
  * same buffer runs inside a watermarked windowed agg). Map side keeps
  * ≤ k (hash, value) pairs per group per partition; a percentile over
  * raw values would instead sort every row of the group.
  *
  * Hash ties (two rows hashing identically — ~2^-60 per pair) keep
  * the smaller value, so even that path is deterministic.
  */
case class SampleValuesAgg(
    hash: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeMap[Long, Double]] {

  require(k >= 1, s"sample size must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeMap[Long, Double] =
    mutable.TreeMap.empty[Long, Double]

  private def add(buf: mutable.TreeMap[Long, Double], h: Long, v: Double): Unit = {
    buf.get(h) match {
      case Some(prev) => if (v < prev) buf.update(h, v)
      case None =>
        if (buf.size < k) buf.update(h, v)
        else if (h < buf.lastKey) { buf.update(h, v); buf.remove(buf.lastKey); () }
    }
  }

  override def update(buf: mutable.TreeMap[Long, Double],
                      input: InternalRow): mutable.TreeMap[Long, Double] = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      add(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(a: mutable.TreeMap[Long, Double],
                     b: mutable.TreeMap[Long, Double]): mutable.TreeMap[Long, Double] = {
    b.foreach { case (h, v) => add(a, h, v) }
    a
  }

  override def eval(buf: mutable.TreeMap[Long, Double]): Any =
    new GenericArrayData(buf.values.toArray.sorted)

  override def serialize(buf: mutable.TreeMap[Long, Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (h, v) => out.writeLong(h); out.writeDouble(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeMap[Long, Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeMap.empty[Long, Double]
    var i = 0
    while (i < n) { buf.update(in.readLong(), in.readDouble()); i += 1 }
    buf
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SampleValuesAgg =
    copy(hash = newChildren(0), value = newChildren(1))

  override def withNewMutableAggBufferOffset(newOffset: Int): SampleValuesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SampleValuesAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "sample_values"
}

object SampleValuesAgg {
  /** `Column` wrapper: values of the k smallest-hashed rows, sorted by
    * value ascending. */
  def sampleValues(hash: Column, value: Column, k: Int): Column =
    GraftBridge.toColumn(
      SampleValuesAgg(GraftBridge.toExpression(hash.cast("long")),
        GraftBridge.toExpression(value.cast("double")), k)
        .toAggregateExpression())
}
