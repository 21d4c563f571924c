package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Misra–Gries frequent-items summary (Misra & Gries 1982, public):
  * at most `k` (value, weight) counters; every arriving value either
  * increments its counter, claims a free slot, or decrements ALL
  * counters by the pruned mass. The classic guarantee: any value
  * whose true frequency exceeds n/(k+1) SURVIVES in the summary —
  * which is what makes this a scale-correct candidate generator for
  * heavy-hitter queries: the map side carries ≤ k counters per
  * partition instead of the full value vocabulary (the `corpus_ngrams`
  * group-by ships every distinct value through the shuffle; at 100 TB
  * the vocabulary IS the cost).
  *
  * The summary itself is ORDER-DEPENDENT (different partitionings
  * keep different below-threshold survivors) — so it is NEVER the
  * answer, only the candidate set. [[graft.operators.TextAnalysis
  * .heavyHitters]] recounts candidates exactly and filters on the
  * true threshold; the guarantee makes that output exact and
  * partitioning-independent even though this buffer is not.
  *
  * Merge is the standard summary merge: add counts, then subtract
  * the (k+1)-th largest weight from all and drop non-positive —
  * preserving the same error bound (Agarwal et al. 2013 mergeable
  * summaries).
  */
case class MgAgg(
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"Misra-Gries needs k >= 1, got $k")

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  private def decrement(buf: mutable.HashMap[String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    buf.foreach { case (v, c) =>
      val nc = c - by
      if (nc <= 0) dead += v else buf(v) = nc
    }
    dead.foreach(buf.remove)
  }

  private def add(buf: mutable.HashMap[String, Long], v: String, w: Long): Unit = {
    buf.get(v) match {
      case Some(c) => buf(v) = c + w
      case None if buf.size < k => buf(v) = w
      case None =>
        // no free slot: decrement everyone by the smaller of w and the
        // current minimum, and keep any remainder of w as a new entry
        val m = buf.values.min
        if (w >= m) {
          decrement(buf, m)
          if (w > m) buf(v) = w - m
        } else decrement(buf, w)
    }
  }

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = value.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (v, w) => a.get(v) match {
      case Some(c) => a(v) = c + w
      case None => a(v) = w
    }}
    if (a.size > k) {
      // subtract the (k+1)-th largest weight, drop non-positive
      val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      decrement(a, cut)
    }
    a
  }

  /** Candidate VALUES only (weights are error-bounded estimates, not
    * answers), sorted for a stable buffer image. */
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keys.toArray.sorted.map(UTF8String.fromString(_): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, c) => out.writeUTF(v); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf(in.readUTF()) = in.readLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MgAgg =
    copy(value = newChildren(0))
}

object MgAgg {
  /** Aggregate column: ≤ k candidate values (sorted array<string>). */
  def candidates(value: Column, k: Int): Column =
    GraftBridge.toColumn(
      MgAgg(GraftBridge.toExpression(value.cast("string")), k)
        .toAggregateExpression())
}
