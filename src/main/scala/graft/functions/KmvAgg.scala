package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch: keeps the k SMALLEST
  * DISTINCT hash values seen, returned ascending as `array<long>`.
  *
  * This is the scale-correct distinct-count primitive: cardinality =
  * (k-1) / frac(h_k) needs only the k smallest distinct hashes, and
  * those survive partial aggregation — the map side keeps AT MOST k
  * longs per group per partition, so the shuffle moves O(partitions×k)
  * values. The naive `count(DISTINCT x)` plan instead shuffles EVERY
  * distinct value to the reducer (an exact-distinct repartition — the
  * thing that dies first on a 100 TB group-by). Unlike HLL sketches
  * the k-min set is order-insensitive and exactly reproducible, so the
  * estimate is bit-identical across engines and partitionings — a
  * DuckDB oracle can state it.
  *
  * Duplicate hashes collapse in the TreeSet (set semantics), which is
  * what makes the sketch correct without any pre-distinct shuffle.
  */
case class KmvAgg(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  private def add(buf: mutable.TreeSet[Long], x: Long): Unit = {
    if (buf.size < k) buf += x
    else if (x < buf.last && !buf.contains(x)) {
      buf += x
      buf -= buf.last
    }
  }

  override def update(buf: mutable.TreeSet[Long],
                      input: InternalRow): mutable.TreeSet[Long] = {
    val v = hash.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: mutable.TreeSet[Long],
                     b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b.foreach(add(a, _))
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf += in.readLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(hash = newChildren(0))
}

object KmvAgg {
  /** Aggregate column: the k smallest distinct hash values, ascending. */
  def kmv(hash: Column, k: Int): Column =
    GraftBridge.toColumn(
      KmvAgg(GraftBridge.toExpression(hash.cast("long")), k).toAggregateExpression())
}
