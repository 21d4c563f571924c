package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ArrayJoin, Cast, Conv, Expression, ExpressionInfo, Literal, Lower, Md5, RegExpReplace, Slice, StringSplit, StringTrim, Substring}
import graft.functions.{ByteStride, DotProduct, JpegDims, L2DistanceSq, MinHashSig, MultiLshBuckets, SimHashAgg}
import graft.operators.Dedup

/** SQL surface for graft's native expressions, registered through
  * `SparkSessionExtensions` (spark.sql.extensions=graft.GraftExtensions)
  * or imperatively with `GraftExtensions.register(spark)` on a live
  * session. After registration plain SQL can call:
  *
  *   graft_dot(a, b)          codegen'd dot product
  *   graft_l2sq(a, b)         codegen'd squared L2 distance
  *   graft_simhash(hashes)    60-bit SimHash of an array<long>
  *   graft_minhash(hashes)    16-hash MinHash signature (default family)
  *   graft_normalize(s)       lower/collapse-whitespace/trim
  *   graft_strip_html(s)      drop tags, decode common entities
  *   graft_truncate(s, n)     first n whitespace tokens
  *   graft_hash64(s)          the engine's md5-derived 60-bit hash
  *   graft_wav_meta(bin)      WAV metadata via the RIFF chunk walk
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private val (defaultAs, defaultBs) = Dedup.minhashConsts(16)

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", name)

  val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot", info("graft_dot", "dot product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("graft_l2sq", info("graft_l2sq", "squared L2"),
      (args: Seq[Expression]) => L2DistanceSq(args(0), args(1))),
    ("graft_simhash", info("graft_simhash", "simhash"),
      (args: Seq[Expression]) => SimHashAgg(args.head)),
    ("graft_minhash", info("graft_minhash", "minhash signature"),
      (args: Seq[Expression]) => MinHashSig(args.head, defaultAs, defaultBs, Dedup.MINHASH_M)),
    // composition functions: the same trees TextAnalysis builds via
    // Columns, constructed directly as Catalyst expressions (Column
    // nodes can't cross the FunctionRegistry boundary)
    ("graft_normalize", info("graft_normalize", "normalize text"),
      (args: Seq[Expression]) => normalizeExpr(args(0))),
    ("graft_strip_html", info("graft_strip_html", "strip html"),
      (args: Seq[Expression]) => stripHtmlExpr(args(0))),
    ("graft_truncate", info("graft_truncate", "truncate tokens"),
      (args: Seq[Expression]) =>
        ArrayJoin(Slice(StringSplit(args(0), str(" "), Literal(-1)),
          Literal(1), args(1)), str(" "), None)),
    ("graft_domain", info("graft_domain",
        "registrable domain of a lowercased host (full public-suffix list)"),
      (args: Seq[Expression]) => graft.functions.RegistrableDomain(args(0))),
    ("graft_hash64", info("graft_hash64", "md5-derived 60-bit hash"),
      (args: Seq[Expression]) =>
        Cast(Conv(Substring(Md5(Cast(args(0),
            org.apache.spark.sql.types.BinaryType)),
          Literal(1), Literal(15)), Literal(16), Literal(10)),
          org.apache.spark.sql.types.LongType)),
    ("graft_forest_keys", info("graft_forest_keys",
        "LSH forest bucket keys: (vec, numTables, bitsPerTable, dim)"),
      (args: Seq[Expression]) => MultiLshBuckets(
        Cast(args(0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
        litInt(args(1)), litInt(args(2)), litInt(args(3)))),
    ("graft_byte_stride", info("graft_byte_stride",
        "every Nth byte of a binary: (bin, stride)"),
      (args: Seq[Expression]) => ByteStride(args(0), litInt(args(1)))),
    ("graft_jpeg_dims", info("graft_jpeg_dims",
        "JPEG (width << 32) | height via the SOF marker walk, NULL if not JPEG"),
      (args: Seq[Expression]) => JpegDims(args(0))),
    ("graft_wav_meta", info("graft_wav_meta",
        "WAV [channels, rate, bits, data_bytes] via the RIFF chunk walk, NULL if not WAV"),
      (args: Seq[Expression]) => graft.functions.WavMeta(args(0))),
    ("graft_mp4_meta", info("graft_mp4_meta",
        "MP4 [timescale, duration, mvhd_version] via the ISO-BMFF box walk, NULL if not MP4"),
      (args: Seq[Expression]) => graft.functions.Mp4Meta(args(0))),
    ("graft_char_entropy", info("graft_char_entropy",
        "Shannon entropy of the a-z/0-9/space character distribution"),
      (args: Seq[Expression]) => graft.functions.CharEntropy(args(0),
        "abcdefghijklmnopqrstuvwxyz0123456789 ")),
    ("graft_hash_embed", info("graft_hash_embed",
        "one-pass hash embedding of a words array: (words, dim)"),
      (args: Seq[Expression]) => graft.functions.HashEmbed(args(0), litInt(args(1)))))

  /** Constant int argument of a SQL function call (e.g. the table
    * count of graft_forest_keys) — must fold at plan time. */
  private def litInt(e: Expression): Int = {
    require(e.foldable, s"expected a literal int argument, got $e")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"expected an int literal, got $other")
    }
  }

  private def str(s: String) = Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s),
    org.apache.spark.sql.types.StringType)

  private def normalizeExpr(e: Expression): Expression =
    StringTrim(RegExpReplace(Lower(e), str("\\s+"), str(" ")))

  private def stripHtmlExpr(e: Expression): Expression = {
    val ents = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ")
    ents.foldLeft(RegExpReplace(e, str("<[^>]*>"), str(" ")): Expression) {
      case (acc, (k, v)) => RegExpReplace(acc, str(k), str(v))
    }
  }

  /** Imperative registration on an already-built session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
}
