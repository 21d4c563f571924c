package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k (dist, id) pairs with smallest
  * dist, ties broken by id. Returns array<struct<dist,id>> ascending.
  *
  * This is the scale-correct batch-kNN primitive: with
  * `groupBy(qid).agg(topk(...))`, partial aggregation keeps AT MOST k
  * rows per partition per query on the map side, so the shuffle moves
  * O(partitions x k) rows — a `row_number() over (partition by qid)`
  * window moves EVERY candidate row to the reducer and sorts there.
  */
case class TopKAgg(
    dist: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(dist, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dist", DoubleType), StructField("id", LongType))))

  // max-heap on (dist, id): the head is the WORST kept pair
  private val ord: Ordering[(Double, Long)] = Ordering.Tuple2[Double, Long]

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](ord)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val d = dist.eval(input)
    val i = id.eval(input)
    if (d != null && i != null) {
      val pair = (d.asInstanceOf[Double], i.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(pair)
      else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Double, Long)],
                     b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach { pair =>
      if (a.size < k) a.enqueue(pair)
      else if (ord.lt(pair, a.head)) { a.dequeue(); a.enqueue(pair) }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sorted(ord)
    new GenericArrayData(sorted.map { case (d, i) =>
      InternalRow(d, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (d, i) => out.writeDouble(d); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(dist = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Aggregate column: smallest-k (dist, id) pairs, ascending. */
  def topk(dist: Column, id: Column, k: Int): Column =
    GraftBridge.toColumn(
      TopKAgg(GraftBridge.toExpression(dist),
        GraftBridge.toExpression(id.cast("long")), k).toAggregateExpression())
}
