package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}

/** Shannon entropy of a string's character distribution over a fixed
  * ASCII `alphabet`, in ONE pass over the bytes — the codegen'd
  * replacement for the 2·|alphabet| translate/length scans the Column
  * formulation costs (measured 2 s → scan-speed at sf0.1).
  *
  * Arithmetic is bit-identical to the per-char-count formulation the
  * DuckDB oracle uses: integer counts, then Σ (c/n)·ln(c/n) folded in
  * alphabet order, negated — only the counting pass is fused.
  * Characters outside the alphabet are ignored; a string with no
  * alphabet characters scores 0.0. The alphabet must be ASCII: UTF-8
  * multi-byte sequences never produce bytes < 0x80, so byte counting
  * equals character counting for every ASCII alphabet. */
case class CharEntropy(child: Expression, alphabet: String)
  extends UnaryExpression {

  require(alphabet.nonEmpty && alphabet.forall(_ < 128) &&
    alphabet.distinct == alphabet,
    "alphabet must be non-empty, ASCII, and duplicate-free")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_char_entropy requires a string argument, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any =
    TextExprs.charEntropy(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes, alphabet)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val alpha = ctx.addReferenceObj("alphabet", alphabet, "java.lang.String")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextExprs.charEntropy($a.getBytes(), $alpha);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExprs {
  def charEntropyCol(s: Column, alphabet: String): Column =
    GraftBridge.toColumn(CharEntropy(GraftBridge.toExpression(s), alphabet))

  /** One-pass count + ordered entropy fold both the interpreted and
    * generated code call. Counts bytes (correct for ASCII alphabets,
    * see [[CharEntropy]]); the fold visits counts in alphabet order,
    * skipping zeros — the same terms, in the same order, as the
    * oracle's `list_sum(list_transform(cnts, …))`. */
  def charEntropy(bytes: Array[Byte], alphabet: String): Double = {
    val counts = new Array[Long](128)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0) counts(b) += 1
      i += 1
    }
    var n = 0L
    var j = 0
    while (j < alphabet.length) {
      n += counts(alphabet.charAt(j))
      j += 1
    }
    if (n == 0L) return 0.0
    var acc = 0.0
    j = 0
    while (j < alphabet.length) {
      val c = counts(alphabet.charAt(j))
      if (c > 0L) {
        val p = c.toDouble / n
        acc += p * math.log(p)
      }
      j += 1
    }
    -acc
  }
}
