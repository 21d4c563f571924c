package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Every `stride`-th byte of a binary column, starting at byte 0 —
  * the frame-subsampling access pattern over an opaque media payload.
  * Operates on RAW BYTES end to end: the string/regex formulation it
  * replaces round-tripped through UTF-8 and corrupted any non-text
  * payload (real media bytes are not valid UTF-8). */
case class ByteStride(child: Expression, stride: Int)
  extends UnaryExpression {

  require(stride >= 1, s"stride must be >= 1, got $stride")

  override def dataType: DataType = BinaryType

  // surface a wrong-typed argument (e.g. a string column through the
  // SQL surface) as a clean analysis error, not a codegen
  // ClassCastException at execution time
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_byte_stride requires a binary argument, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val in = a.asInstanceOf[Array[Byte]]
    val out = new Array[Byte]((in.length + stride - 1) / stride)
    var i = 0
    while (i < out.length) {
      out(i) = in(i * stride)
      i += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |byte[] $out = new byte[($a.length + $stride - 1) / $stride];
         |for (int $i = 0; $i < $out.length; $i++) {
         |  $out[$i] = $a[$i * $stride];
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Pack quantized integer codes into the reference's byte layout
  * (collection.go:715-745 encodeDocument): 4-bit — two codes per
  * byte, EVEN index in the high nibble, odd in the low; 8-bit — one
  * byte per code; 16-bit — big-endian uint16. The packed form is the
  * storage the reference mmaps; here it is a binary column 2-16x
  * narrower than `array<int>` codes on the scan. */
case class PackCodes(child: Expression, bits: Int)
  extends UnaryExpression {

  require(Seq(4, 8, 16).contains(bits), s"packable bits are 4/8/16, got $bits")

  override def dataType: DataType = BinaryType

  override def nullSafeEval(a: Any): Any = {
    val codes = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = codes.numElements()
    bits match {
      case 4 =>
        val out = new Array[Byte]((n + 1) / 2)
        var i = 0
        while (i < n) {
          val c = codes.getInt(i)
          if (i % 2 == 0) out(i / 2) = (c << 4).toByte
          else out(i / 2) = (out(i / 2) | (c & 0x0F)).toByte
          i += 1
        }
        out
      case 8 =>
        val out = new Array[Byte](n)
        var i = 0
        while (i < n) { out(i) = codes.getInt(i).toByte; i += 1 }
        out
      case 16 =>
        val out = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val c = codes.getInt(i)
          out(i * 2) = ((c >> 8) & 0xFF).toByte
          out(i * 2 + 1) = (c & 0xFF).toByte
          i += 1
        }
        out
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val body = bits match {
        case 4 =>
          s"""
             |byte[] $out = new byte[($n + 1) / 2];
             |for (int $i = 0; $i < $n; $i++) {
             |  int $c = $a.getInt($i);
             |  if ($i % 2 == 0) $out[$i / 2] = (byte) ($c << 4);
             |  else $out[$i / 2] = (byte) ($out[$i / 2] | ($c & 0x0F));
             |}
           """.stripMargin
        case 8 =>
          s"""
             |byte[] $out = new byte[$n];
             |for (int $i = 0; $i < $n; $i++) {
             |  $out[$i] = (byte) $a.getInt($i);
             |}
           """.stripMargin
        case 16 =>
          s"""
             |byte[] $out = new byte[$n * 2];
             |for (int $i = 0; $i < $n; $i++) {
             |  int $c = $a.getInt($i);
             |  $out[$i * 2] = (byte) (($c >> 8) & 0xFF);
             |  $out[$i * 2 + 1] = (byte) ($c & 0xFF);
             |}
           """.stripMargin
      }
      s"""
         |int $n = $a.numElements();
         |$body
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Inverse of [[PackCodes]] — mirror of the reference's decodeVector
  * (collection.go:768-797): binary storage back to `dims` integer
  * codes, ready for [[Quantization.dequantize]]. */
case class UnpackCodes(child: Expression, bits: Int, dims: Int)
  extends UnaryExpression {

  require(Seq(4, 8, 16).contains(bits), s"packable bits are 4/8/16, got $bits")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val data = a.asInstanceOf[Array[Byte]]
    val out = new Array[Int](dims)
    var i = 0
    while (i < dims) {
      out(i) = bits match {
        case 4 => if (i % 2 == 0) (data(i / 2) & 0xFF) >>> 4 else data(i / 2) & 0x0F
        case 8 => data(i) & 0xFF
        case 16 => ((data(i * 2) & 0xFF) << 8) | (data(i * 2 + 1) & 0xFF)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val get = bits match {
        case 4 => s"($i % 2 == 0) ? (($a[$i / 2] & 0xFF) >>> 4) : ($a[$i / 2] & 0x0F)"
        case 8 => s"$a[$i] & 0xFF"
        case 16 => s"(($a[$i * 2] & 0xFF) << 8) | ($a[$i * 2 + 1] & 0xFF)"
      }
      s"""
         |int[] $out = new int[$dims];
         |for (int $i = 0; $i < $dims; $i++) {
         |  $out[$i] = $get;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** JPEG dimensions via the SOF marker walk, packed as
  * (width << 32) | height in one long (NULL when the payload is not a
  * JPEG or carries no start-of-frame). JPEG headers are
  * variable-length segment chains — APP0/EXIF/quantization tables of
  * arbitrary size precede the SOF — so unlike PNG/GIF there is no
  * fixed offset a `substring` column can read; the walk is a loop,
  * and a loop belongs in a codegen'd expression (full scan speed, no
  * UDF, no UTF-8 round-trip), the same tier as [[ByteStride]].
  * Reads SOF0-SOF15 except the DHT/DAC/JPG pseudo-markers (C4/C8/CC),
  * so baseline AND progressive JPEGs report. */
case class JpegDims(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_jpeg_dims requires a binary argument, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val r = BinaryExprs.jpegScan(a.asInstanceOf[Array[Byte]])
    if (r < 0) null else java.lang.Long.valueOf(r)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |long $r = graft.functions.BinaryExprs.jpegScan($a);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** WAV (RIFF) metadata via the chunk walk, as `array<long>`
  * [channels, sample_rate, bits_per_sample, data_bytes] (NULL when the
  * payload is not RIFF/WAVE or has no fmt chunk). Like JPEG, RIFF is a
  * chain of variable-length chunks — LIST/INFO/fact chunks of
  * arbitrary size may precede `fmt ` — so there is no fixed offset a
  * `substring` column can read and the walk is a loop in a codegen'd
  * expression, the same tier as [[JpegDims]]. Chunk sizes are
  * little-endian and odd-sized chunks carry a pad byte (RIFF rule);
  * a final `data` chunk may be truncated on disk — its DECLARED size
  * is reported, which is what streaming WAV writers produce. */
case class WavMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_wav_meta requires a binary argument, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val r = BinaryExprs.wavScan(a.asInstanceOf[Array[Byte]])
    if (r == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(r)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |long[] $r = graft.functions.BinaryExprs.wavScan($a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($r); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MP4 (ISO BMFF) movie metadata via the box walk, as `array<long>`
  * [timescale, duration, mvhd_version] (NULL when the payload is not
  * an MP4 or carries no moov/mvhd). The file is a chain of
  * variable-size big-endian boxes — ftyp/free/mdat of arbitrary size
  * precede moov, and inside moov other children may precede mvhd — so
  * like JPEG segments and RIFF chunks there is no fixed offset; the
  * walk handles 64-bit `largesize` (size == 1) and to-end (size == 0)
  * boxes and stops cleanly on corrupt sizes. Same codegen tier as
  * [[JpegDims]]/[[WavMeta]]. */
case class Mp4Meta(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_mp4_meta requires a binary argument, got ${other.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val r = BinaryExprs.mp4Scan(a.asInstanceOf[Array[Byte]])
    if (r == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(r)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |long[] $r = graft.functions.BinaryExprs.mp4Scan($a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($r); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BinaryExprs {
  def byteStride(bin: Column, stride: Int): Column =
    GraftBridge.toColumn(ByteStride(GraftBridge.toExpression(bin), stride))

  def wavMeta(bin: Column): Column =
    GraftBridge.toColumn(WavMeta(GraftBridge.toExpression(bin)))

  def mp4Meta(bin: Column): Column =
    GraftBridge.toColumn(Mp4Meta(GraftBridge.toExpression(bin)))

  /** The ISO-BMFF box walk both the interpreted and generated code
    * call: returns [timescale, duration, mvhd_version], or null when
    * the payload is not an MP4 (first box must be `ftyp`), has no
    * moov/mvhd, or is structurally corrupt. Positions are tracked as
    * longs so a 64-bit `largesize` cannot wrap the cursor. */
  def mp4Scan(b: Array[Byte]): Array[Long] = {
    val n = b.length.toLong
    def be32(i: Long): Long = {
      val j = i.toInt
      ((b(j) & 0xFF).toLong << 24) | ((b(j + 1) & 0xFF) << 16) |
        ((b(j + 2) & 0xFF) << 8) | (b(j + 3) & 0xFF)
    }
    def be64(i: Long): Long = (be32(i) << 32) | be32(i + 4)
    def typeIs(i: Long, t: String): Boolean = {
      val j = i.toInt
      b(j) == t.charAt(0).toByte && b(j + 1) == t.charAt(1).toByte &&
        b(j + 2) == t.charAt(2).toByte && b(j + 3) == t.charAt(3).toByte
    }
    // (size, headerLen) of the box at i, or null on corruption
    def boxAt(i: Long, end: Long): Array[Long] = {
      if (i + 8 > end) return null
      val s0 = be32(i)
      if (s0 == 1L) {
        if (i + 16 > end) return null
        val s = be64(i + 8)
        if (s < 16) null else Array(s, 16L)
      } else if (s0 == 0L) Array(end - i, 8L)
      else if (s0 < 8) null
      else Array(s0, 8L)
    }
    if (n < 12 || !(be32(0) >= 8 && typeIs(4, "ftyp"))) return null
    var i = 0L
    while (i + 8 <= n) {
      val box = boxAt(i, n)
      if (box == null) return null
      if (typeIs(i + 4, "moov")) {
        val end = math.min(i + box(0), n)
        var j = i + box(1)
        while (j + 8 <= end) {
          val cb = boxAt(j, end)
          if (cb == null) return null
          if (typeIs(j + 4, "mvhd")) {
            val body = j + cb(1)
            val v = if (body < n) b(body.toInt) & 0xFF else return null
            if (v == 1) {
              // ver+flags(4) + ctime(8) + mtime(8) -> ts(4), dur(8)
              if (body + 32 > n) return null
              return Array(be32(body + 20), be64(body + 24), 1L)
            } else {
              // ver+flags(4) + ctime(4) + mtime(4) -> ts(4), dur(4)
              if (body + 20 > n) return null
              return Array(be32(body + 12), be32(body + 16), 0L)
            }
          }
          if (j + cb(0) <= j) return null
          j += cb(0)
        }
        return null // moov without mvhd
      }
      if (i + box(0) <= i) return null
      i += box(0)
    }
    null
  }

  /** The RIFF chunk walk both the interpreted and generated code call:
    * returns [channels, sampleRate, bitsPerSample, dataBytes], or null
    * when not RIFF/WAVE or no `fmt ` chunk is found. `data` is 0 when
    * the chunk is absent; its declared size is trusted even if the
    * payload is truncated (the streaming-writer shape). Static and
    * JVM-visible so `doGenCode` emits a plain call. */
  def wavScan(b: Array[Byte]): Array[Long] = {
    def u8(i: Int): Int = b(i) & 0xFF
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)).toLong |
      (u8(i + 3).toLong << 24)
    if (b.length < 12) return null
    if (!(u8(0) == 'R' && u8(1) == 'I' && u8(2) == 'F' && u8(3) == 'F')) return null
    if (!(u8(8) == 'W' && u8(9) == 'A' && u8(10) == 'V' && u8(11) == 'E')) return null
    var channels = -1L; var rate = -1L; var bits = -1L; var dataBytes = 0L
    var i = 12
    while (i + 8 <= b.length) {
      val id0 = u8(i); val id1 = u8(i + 1); val id2 = u8(i + 2); val id3 = u8(i + 3)
      val size = le32(i + 4)
      val body = i + 8
      if (id0 == 'f' && id1 == 'm' && id2 == 't' && id3 == ' ') {
        if (size < 16 || body + 16 > b.length) return null
        channels = le16(body + 2).toLong
        rate = le32(body + 4)
        bits = le16(body + 14).toLong
      } else if (id0 == 'd' && id1 == 'a' && id2 == 't' && id3 == 'a') {
        dataBytes = size // declared size; payload may be truncated
      }
      // RIFF pads odd-sized chunk bodies to even offsets; a corrupt
      // declared size (up to 2^32-1) must not wrap to a negative or
      // stalled offset — stop the walk, keeping whatever was parsed
      val next = body.toLong + size + (size & 1L)
      if (next <= i || next > Int.MaxValue) i = b.length
      else i = next.toInt
    }
    if (channels < 0) null else Array(channels, rate, bits, dataBytes)
  }

  def jpegDims(bin: Column): Column =
    GraftBridge.toColumn(JpegDims(GraftBridge.toExpression(bin)))

  /** The SOF walk both the interpreted and generated code call:
    * returns (width << 32) | height, or -1 when not a JPEG / no SOF /
    * truncated. Static and JVM-visible so `doGenCode` can emit a
    * plain call instead of inlining the loop. */
  def jpegScan(b: Array[Byte]): Long = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return -1L
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return -1L // marker desync: corrupt
      val m = b(i + 1) & 0xFF
      if (m == 0xFF) { i += 1 } // fill byte
      else if (m == 0x01 || (m >= 0xD0 && m <= 0xD8)) { i += 2 } // standalone
      else {
        val segLen = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        if (segLen < 2) return -1L
        if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          // SOF: [len][precision][height hi lo][width hi lo]
          if (i + 8 >= b.length) return -1L
          val h = ((b(i + 5) & 0xFF) << 8) | (b(i + 6) & 0xFF)
          val w = ((b(i + 7) & 0xFF) << 8) | (b(i + 8) & 0xFF)
          return (w.toLong << 32) | h.toLong
        }
        if (m == 0xD9 || m == 0xDA) return -1L // EOI / scan data: no SOF seen
        i += 2 + segLen
      }
    }
    -1L
  }

  def packCodes(codes: Column, bits: Int): Column =
    GraftBridge.toColumn(PackCodes(
      GraftBridge.toExpression(codes.cast("array<int>")), bits))

  def unpackCodes(bin: Column, bits: Int, dims: Int): Column =
    GraftBridge.toColumn(UnpackCodes(GraftBridge.toExpression(bin), bits, dims))
}
