package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Exact distinct-value set with a hard size cap: returns the sorted
  * distinct LONG values (a trailing null echoes a null input value)
  * while the non-null count stays ≤ `cap`, and NULL — the over-cap
  * marker — once it exceeds it.
  *
  * One aggregation thereby answers BOTH questions a bounded candidate
  * grid needs ("does the cap bind?" and "if not, what are the exact
  * values?"), where a `countDistinct` pass + a `distinct()` subtree
  * cost a separate corpus job each ([[graft.operators.Boost]], VERDICT
  * r13 #8). The buffer holds ≤ cap+1 longs per group per partition and
  * is cleared the moment it overflows, so memory stays bounded however
  * skewed the column; the set union is order-insensitive, making the
  * result partitioning- and engine-independent.
  */
case class BoundedDistinctAgg(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedDistinctAgg.Buf] {

  require(cap >= 1, s"cap must be >= 1, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def createAggregationBuffer(): BoundedDistinctAgg.Buf =
    new BoundedDistinctAgg.Buf(mutable.TreeSet.empty[Long], false, false)

  private def add(buf: BoundedDistinctAgg.Buf, v: Long): Unit =
    if (!buf.over) {
      buf.set.add(v)
      if (buf.set.size > cap) { buf.over = true; buf.set.clear() }
    }

  override def update(buf: BoundedDistinctAgg.Buf,
                      input: InternalRow): BoundedDistinctAgg.Buf = {
    val v = child.eval(input)
    if (v == null) buf.hasNull = true else add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BoundedDistinctAgg.Buf,
                     b: BoundedDistinctAgg.Buf): BoundedDistinctAgg.Buf = {
    a.hasNull ||= b.hasNull
    if (b.over) { a.over = true; a.set.clear() }
    else b.set.foreach(add(a, _))
    a
  }

  override def eval(buf: BoundedDistinctAgg.Buf): Any =
    if (buf.over) null
    else {
      val vals: Array[Any] = buf.set.toArray.map(v => v: Any)
      new GenericArrayData(if (buf.hasNull) vals :+ (null: Any) else vals)
    }

  override def serialize(buf: BoundedDistinctAgg.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.over)
    out.writeBoolean(buf.hasNull)
    out.writeInt(buf.set.size)
    buf.set.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedDistinctAgg.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val over = in.readBoolean()
    val hasNull = in.readBoolean()
    val n = in.readInt()
    val set = mutable.TreeSet.empty[Long]
    var i = 0
    while (i < n) { set.add(in.readLong()); i += 1 }
    new BoundedDistinctAgg.Buf(set, hasNull, over)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedDistinctAgg =
    copy(child = newChildren(0))

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "bounded_distinct"
}

object BoundedDistinctAgg {
  final class Buf(val set: mutable.TreeSet[Long],
                  var hasNull: Boolean, var over: Boolean)

  /** `Column` wrapper: sorted distinct longs (trailing null for a null
    * input) while ≤ cap non-null values exist, NULL once over cap. */
  def boundedDistinct(value: Column, cap: Int): Column =
    GraftBridge.toColumn(
      BoundedDistinctAgg(GraftBridge.toExpression(value.cast("long")), cap)
        .toAggregateExpression())
}
