package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar vector quantization, matching the reference semantics
  * (quantization.go): 32/64 bits are raw float widths (lossless here —
  * Spark stores float/double natively); 4/8/16 bits clamp to [-1, 1]
  * and affine-map onto [0, 2^bits - 1] with round-half-away-from-zero
  * (Go math.Round == Spark/DuckDB round()).
  *
  * Everything is `transform`/`aggregate` over array columns — pure
  * map-side, codegen'd, no UDFs. Quantized vectors become
  * array<int>, a 4-8x scan-width reduction at 100 TB.
  */
object Quantization {

  private def clamp(x: Column): Column = least(greatest(x, lit(-1.0)), lit(1.0))

  /** Quantize an array<float/double> column to integer codes. */
  def quantize(vec: Column, bits: Int): Column = {
    require(Seq(4, 8, 16).contains(bits), s"lossy quantization bits must be 4/8/16, got $bits")
    val maxInt = (1 << bits) - 1
    transform(vec.cast("array<double>"),
      x => round((clamp(x) + 1.0) / 2.0 * maxInt).cast("int"))
  }

  /** Reverse map integer codes back to [-1, 1] doubles. */
  def dequantize(codes: Column, bits: Int): Column = {
    val maxInt = (1 << bits) - 1
    transform(codes, q => q.cast("double") / maxInt * 2.0 - 1.0)
  }

  /** Pack a float vector into the reference's byte STORAGE layout
    * (collection.go:715: 4-bit = two codes/byte even-high, 8-bit =
    * byte/code, 16-bit = big-endian): quantize then [[PackCodes]].
    * The binary column is 2-16x narrower than `array<int>` codes. */
  def packVector(vec: Column, bits: Int): Column =
    BinaryExprs.packCodes(quantize(vec, bits), bits)

  /** Inverse of [[packVector]] — decode `dims` values back to
    * dequantized doubles (collection.go:768 decodeVector). */
  def unpackVector(bin: Column, bits: Int, dims: Int): Column =
    dequantize(BinaryExprs.unpackCodes(bin, bits, dims), bits)

  /** Per-element absolute reconstruction error of a quantize round-trip. */
  def reconstructionError(vec: Column, bits: Int): Column = {
    val maxInt = (1 << bits) - 1
    transform(vec.cast("array<double>"), x =>
      abs(x - (round((clamp(x) + 1.0) / 2.0 * maxInt) / maxInt * 2.0 - 1.0)))
  }

  /** Corpus-level reconstruction-error report per candidate bit
    * width — the pick-your-width table consulted before freezing the
    * storage quantization (the reference exposes the width as a
    * per-collection option, collection.go:30): one row per width with
    * the corpus mean and max absolute error.
    *
    * Determinism: the corpus-wide mean of float errors would be
    * summation-order-dependent, so each vector's error sum (folded in
    * ARRAY order — deterministic per row) quantizes to a 1e-12
    * integer grid before the corpus agg; integer sums are exact in
    * any engine/partitioning and the mean divides them in one fixed
    * expression ([[graft.operators.Eval.embeddingDrift]]'s rule).
    * `max` is order-free. One map-side pass + a single-row agg per
    * width. */
  def errorSweep(df: org.apache.spark.sql.DataFrame, vecCol: String,
                 widths: Seq[Int]): org.apache.spark.sql.DataFrame = {
    require(widths.nonEmpty, "errorSweep needs at least one width")
    widths.map { bits =>
      val err = reconstructionError(col(vecCol), bits)
      df.select(
          round(aggregate(err, lit(0.0), (a, x) => a + x) * 1e12, 0)
            .cast("long").as("_qs"),
          size(col(vecCol)).cast("long").as("_d"),
          array_max(err).as("_mx"))
        .agg(count(lit(1)).as("n_vectors"), sum(col("_qs")).as("_sq"),
          sum(col("_d")).as("_dims"), max(col("_mx")).as("max_err"))
        .select(lit(bits).cast("long").as("bits"), col("n_vectors"),
          ((col("_sq").cast("double") / 1e12) / col("_dims")).as("mean_abs_err"),
          col("max_err"))
    }.reduce(_ unionByName _)
  }
}
