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

/** [[TopKAgg]]'s exact-integer twin: keeps the k (rank, id) pairs with
  * smallest LONG rank, ties broken by id; returns
  * array<struct<rank,id>> ascending. Exists because a 64-bit hash
  * rank cast to double loses bits past the 53-bit mantissa — two
  * distinct ranks could collide and flip which row survives a cap —
  * while the long-tuple ordering reproduces a
  * `row_number() over (order by rank, id)` cut EXACTLY, with the
  * bounded map-side partials a window can never have (the hot bucket
  * a cap exists for is precisely the partition a window would
  * serialize into one task's sort — VERDICT r15 #4). */
case class LongTopKAgg(
    rank: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {

  override def children: Seq[Expression] = Seq(rank, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rank", LongType), StructField("id", LongType))))

  // max-heap on (rank, id): the head is the WORST kept pair
  private val ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty[(Long, Long)](ord)

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val r = rank.eval(input)
    val i = id.eval(input)
    if (r != null && i != null) {
      val pair = (r.asInstanceOf[Long], i.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(pair)
      else if (ord.lt(pair, buf.head)) { buf.dequeue(); buf.enqueue(pair) }
    }
    buf
  }

  override def merge(a: mutable.PriorityQueue[(Long, Long)],
                     b: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    b.foreach { pair =>
      if (a.size < k) a.enqueue(pair)
      else if (ord.lt(pair, a.head)) { a.dequeue(); a.enqueue(pair) }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    val sorted = buf.toArray.sorted(ord)
    new GenericArrayData(sorted.map { case (r, i) =>
      InternalRow(r, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (r, i) => out.writeLong(r); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((in.readLong(), in.readLong())))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LongTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): LongTopKAgg =
    copy(rank = newChildren(0), id = newChildren(1))
}

object LongTopKAgg {
  /** Aggregate column: smallest-k (rank, id) pairs, ascending. */
  def topk(rank: Column, id: Column, k: Int): Column =
    GraftBridge.toColumn(
      LongTopKAgg(GraftBridge.toExpression(rank.cast("long")),
        GraftBridge.toExpression(id.cast("long")), k).toAggregateExpression())
}
