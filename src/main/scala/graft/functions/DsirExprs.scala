package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused kernels for the DSIR gram pipeline ([[graft.operators
  * .Sampling]]): both the model build and the scoring pass visit
  * every unigram THEN every bigram of a document's word array, hash
  * each gram with the engine's md5-derived 60-bit hash, and either
  * count (`DsirGramCountsAgg`) or sum a per-bucket log-ratio
  * (`DsirScore`).
  *
  * The Column formulation paid per-gram Catalyst dispatch twice over
  * the corpus: the model side EXPLODED |grams| rows into a keyed agg
  * (row materialization + hash-map probe per gram), and the scoring
  * side folded an interpreted higher-order lambda per gram (HOFs
  * never enter codegen — SURVEY §4's map-in-lambda trap). The fused
  * kernels do the identical arithmetic in one tight loop per
  * document: integer bucket counts (order-insensitive sums → the
  * same integers), and the scoring fold adds the same doubles in the
  * same unigrams-then-bigrams position order from the same 0.0 seed
  * — bit-equal by construction, SamplingSpec-pinned against the
  * brute-force local model.
  *
  * Bigram hashing matches `concat_ws(" ", w_i, w_{i+1})` byte-
  * exactly: UTF-8 concatenation with a single 0x20 separator. */
object DsirExprs {

  /** Buckets of the grams of `words` (non-null, non-empty entries):
    * unigram buckets then bigram buckets, each `hash60(bytes) %
    * buckets`. Calls `f` for each gram's bucket in position order —
    * the ONE walk both kernels share, so count and score can never
    * disagree on the gram sequence. */
  @inline private def foreachGramBucket(words: ArrayData, buckets: Int)
                                       (f: Int => Unit): Int = {
    val n = words.numElements()
    var grams = 0
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        if (w.numBytes() > 0) {
          f((TextExprs.hash60(w.getBytes) % buckets).toInt)
          grams += 1
        }
      }
      i += 1
    }
    if (n >= 2) {
      i = 0
      while (i < n - 1) {
        val ok = !words.isNullAt(i) && !words.isNullAt(i + 1)
        if (ok) {
          val a = words.getUTF8String(i).getBytes
          val b = words.getUTF8String(i + 1).getBytes
          val g = new Array[Byte](a.length + 1 + b.length)
          System.arraycopy(a, 0, g, 0, a.length)
          g(a.length) = ' '
          System.arraycopy(b, 0, g, a.length + 1, b.length)
          f((TextExprs.hash60(g) % buckets).toInt)
          grams += 1
        }
        i += 1
      }
    }
    grams
  }

  /** Model-side kernel body: increment `buf(bucket)` per gram. */
  def countInto(words: ArrayData, buckets: Int, buf: Array[Long]): Unit = {
    foreachGramBucket(words, buckets)(b => buf(b) += 1L)
    ()
  }

  /** Scoring kernel body both the interpreted and generated code
    * call: logw accumulates from 0.0 in gram-position order. Returns
    * struct(n_grams long, dsir_logw double). */
  def score(words: ArrayData, model: Array[Double]): InternalRow = {
    val buckets = model.length
    var acc = 0.0
    val n = foreachGramBucket(words, buckets)(b => acc += model(b))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, acc))
  }

  def scoreCol(words: Column, model: Array[Double]): Column =
    GraftBridge.toColumn(
      DsirScore(GraftBridge.toExpression(words), model.toIndexedSeq))

  def gramCounts(words: Column, buckets: Int): Column =
    GraftBridge.toColumn(
      DsirGramCountsAgg(GraftBridge.toExpression(words), buckets)
        .toAggregateExpression())
}

/** `struct(n_grams, dsir_logw)` of a word array against a broadcast-
  * as-literal bucket→logratio model — the codegen'd scoring kernel
  * behind [[graft.operators.Sampling.dsirScoreAll]] (and through it
  * the batch `dsirWeights` and the streaming `Ingest.dsirStream`). */
case class DsirScore(child: Expression, model: IndexedSeq[Double])
  extends UnaryExpression {

  require(model.nonEmpty, "DsirScore needs a non-empty model")

  // The model is held as an IndexedSeq, NOT an Array (ADVICE r14):
  // arrays compare by reference, so two semantically identical
  // DsirScore expressions would never be equal and Catalyst
  // canonicalization / subexpression elimination / exchange reuse
  // could not dedupe them. The kernels still run on a primitive
  // double[], materialized once per (driver, executor) JVM copy.
  @transient private lazy val modelArr: Array[Double] = model.toArray

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("dsir_logw", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_dsir_score requires array<string>, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any =
    DsirExprs.score(a.asInstanceOf[ArrayData], modelArr)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val modelRef = ctx.addReferenceObj("dsirModel", modelArr, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DsirExprs.score($a, $modelRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_dsir_score"
}

/** Per-bucket gram counts over a corpus of word arrays, as ONE
  * aggregation with an `Array[Long](buckets)` buffer — the model-side
  * twin of [[DsirScore]]. Replaces the explode → keyed-agg pipeline
  * (one materialized row + hash probe per gram) with an array-index
  * increment per gram; partial buffers merge by vector addition, so
  * the counts are the same exact integers in any partitioning. Buffer
  * is `buckets` longs (32 KB at 4096) per group per partition. */
case class DsirGramCountsAgg(
    words: Expression,
    buckets: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(buckets > 0, s"buckets must be > 0, got $buckets")

  override def children: Seq[Expression] = Seq(words)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](buckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val w = words.eval(input)
    if (w != null)
      DsirExprs.countInto(w.asInstanceOf[ArrayData], buckets, buf)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buckets) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buckets) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](buckets)
    var i = 0
    while (i < buckets) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DsirGramCountsAgg =
    copy(words = newChildren(0))

  override def withNewMutableAggBufferOffset(newOffset: Int): DsirGramCountsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DsirGramCountsAgg =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "dsir_gram_counts"
}
