package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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
  * family sig_j = min over h of (a_j * (h mod m) + b_j) mod m. */
case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], m: Long)
  extends UnaryExpression {
  // input hashes reduce mod m IN the kernel (identity for inputs
  // already < m, so the value contract is unchanged): callers used to
  // pre-reduce via an interpreted `transform(shs, h => h % m)` lambda
  // per shingle — r14 folded it into the loop

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
        val h = hs.getLong(t) % m
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
         |    long $h = $a.getLong($t) % ${m}L;
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

/** Distinct hashed word-n-gram shingles of a words array, in
  * first-occurrence order — the fused form of
  * `array_distinct(transform(shinglesFromWords(w, n), s => hash64(s)))`
  * that feeds the WHOLE minhash dedup family ([[graft.operators.Dedup
  * .shingleSets]]). The Column formulation paid, per shingle position,
  * an interpreted lambda building the joined string plus Spark's
  * md5 → hex-string → conv(16,10) round trip; this kernel joins the
  * UTF-8 word bytes with a single 0x20 (byte-identical to
  * `concat_ws(" ", …)`), hashes via [[TextExprs.hash60]] (identical to
  * Dedup.hash64), and dedups with first-occurrence order preserved
  * (identical to `array_distinct`) — so signatures, band keys,
  * Jaccard sets, and every oracle stay bit-for-bit. */
case class ShingleHashSet(child: Expression, n: Int,
                          distinct: Boolean = true)
  extends UnaryExpression {

  require(n >= 1, s"shingle n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchExprs.shingleHashSet(input.asInstanceOf[ArrayData], n, distinct)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchExprs.shingleHashSet($a, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_shingle_hashes"
}

/** Count of shingle hashes whose k=3 bloom positions are ALL set in
  * the bitmap — the corpus-side probe of `Dedup.decontaminateBloom`.
  * Positions are byte-identical to the SQL form
  * `conv(substring(md5(concat('bl0_', cast(sh as string))), 1+8t, 8), 16, 10) % mBits`
  * (8 hex chars at offset 8t = digest bytes 4t..4t+3 as an unsigned
  * big-endian 32-bit value), so the bitmap BUILD side's arithmetic is
  * untouched and every oracle stays bit-for-bit. ONE md5 per shingle
  * replaces the interpreted lambda's three (all three positions read
  * the SAME digest); bit tests index the broadcast word array in
  * place — nothing is copied per row. */
case class BloomHitsCount(left: Expression, right: Expression, mBits: Int)
  extends BinaryExpression {

  require(mBits >= 64 && mBits % 64 == 0,
    s"mBits must be a positive multiple of 64, got $mBits")

  override def dataType: DataType = LongType

  override def nullSafeEval(shs: Any, bm: Any): Any =
    SketchExprs.bloomHits(shs.asInstanceOf[ArrayData],
      bm.asInstanceOf[ArrayData], mBits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (shs, bm) =>
      s"${ev.value} = graft.functions.SketchExprs.bloomHits($shs, $bm, $mBits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bloom_hits"
}

object SketchExprs {
  def simhash(tokenHashes: Column): Column =
    GraftBridge.toColumn(SimHashAgg(GraftBridge.toExpression(tokenHashes)))

  def bloomHitsCol(shingleHashes: Column, bitmap: Column, mBits: Int): Column =
    GraftBridge.toColumn(BloomHitsCount(
      GraftBridge.toExpression(shingleHashes),
      GraftBridge.toExpression(bitmap), mBits))

  /** Kernel body both the interpreted and generated code call. */
  def bloomHits(shs: ArrayData, bm: ArrayData, mBits: Int): Long = {
    val n = shs.numElements()
    var hits = 0L
    var i = 0
    while (i < n) {
      val d = TextExprs.md5Digest(
        ("bl0_" + shs.getLong(i)).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var all = true
      var t = 0
      while (all && t < 3) {
        val o = 4 * t
        val p = ((((d(o) & 0xFFL) << 24) | ((d(o + 1) & 0xFFL) << 16) |
          ((d(o + 2) & 0xFFL) << 8) | (d(o + 3) & 0xFFL)) % mBits).toInt
        all = ((bm.getLong(p / 64) >>> (p % 64)) & 1L) != 0L
        t += 1
      }
      if (all) hits += 1
      i += 1
    }
    hits
  }

  def minhashSig(shingleHashes: Column, as: Seq[Long], bs: Seq[Long], m: Long): Column =
    GraftBridge.toColumn(MinHashSig(GraftBridge.toExpression(shingleHashes), as, bs, m))

  def shingleHashes(words: Column, n: Int): Column =
    GraftBridge.toColumn(ShingleHashSet(GraftBridge.toExpression(words), n))

  /** Positional variant (`distinct = false`): every shingle position's
    * hash, duplicates preserved — the winnowing/simhash input shape
    * (`transform(shingles, hash64)` with no array_distinct). */
  def shingleHashSeq(words: Column, n: Int): Column =
    GraftBridge.toColumn(
      ShingleHashSet(GraftBridge.toExpression(words), n, distinct = false))

  /** Kernel body both the interpreted and generated code call: for
    * each of the `count - n + 1` positions, hash the 0x20-joined
    * UTF-8 bytes of words i..i+n-1 and keep first occurrences. A null
    * word element is treated as an empty word (defensive only — split
    * never produces nulls, and the Column formulation's concat_ws
    * would skip a null AND its separator, a shape unreachable from
    * the tokenizer). */
  def shingleHashSet(words: ArrayData, n: Int,
                     distinct: Boolean = true): ArrayData = {
    val count = words.numElements()
    if (count < n) return new GenericArrayData(Array.empty[Long])
    val bytes = new Array[Array[Byte]](count)
    var i = 0
    while (i < count) {
      bytes(i) =
        if (words.isNullAt(i)) Array.emptyByteArray
        else words.getUTF8String(i).getBytes
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    i = 0
    while (i <= count - n) {
      var len = n - 1
      var k = 0
      while (k < n) { len += bytes(i + k).length; k += 1 }
      val g = new Array[Byte](len)
      var pos = 0
      k = 0
      while (k < n) {
        val b = bytes(i + k)
        System.arraycopy(b, 0, g, pos, b.length)
        pos += b.length
        if (k < n - 1) { g(pos) = ' '; pos += 1 }
        k += 1
      }
      val h = TextExprs.hash60(g)
      if (!distinct || seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
