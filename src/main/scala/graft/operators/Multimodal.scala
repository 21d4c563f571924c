package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: images/audio/video ride along as opaque
  * `binary` columns with typed metadata, processed by per-partition
  * batch operators.
  *
  * The reference embeds images by shipping base64 payloads to Ollama
  * (embedding.go:56-76). Offline, the *decode* step is a documented
  * deterministic stub — but the Spark-side plumbing (schema, binary
  * columns, partition-batched processing, feature schema) is real and
  * is exactly what a libjpeg/ffmpeg-backed decoder would plug into.
  *
  * Scale posture: binary payloads stay columnar in parquet; feature
  * extraction is mapPartitions (no per-row JVM<->format overhead, one
  * decoder instance per partition batch); nothing is collected to the
  * driver.
  */
object Multimodal {

  /** Feature row produced by the (stubbed) decoder. */
  case class MediaFeatures(doc_id: Long, n_bytes: Long, checksum: String,
                           width: Int, height: Int, mean_luma: Double)

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", StringType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_luma", DoubleType, nullable = false)))

  /** STUB decoder: a real implementation would hand `bytes` to an
    * image codec. This deterministic fake derives "dimensions" and
    * "luma" from the payload so the pipeline shape (batch in, typed
    * features out) is fully exercised and testable offline. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Double) = {
    val n = bytes.length
    val width = 16 + (math.abs(n * 31 + 7) % 1024)
    val height = 16 + (math.abs(n * 17 + 3) % 1024)
    val luma = if (n == 0) 0.0
      else bytes.iterator.map(b => (b & 0xFF).toDouble).sum / n / 255.0
    (width, height, luma)
  }

  /** Per-partition batched feature extraction over a binary column.
    * The decoder is instantiated once per partition (the pattern a
    * real codec needs), rows stream through without materializing the
    * whole partition. */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String)
                     (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one "decoder" per partition; stub has no real init cost
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) =>
          val (w, h, luma) = decodeStub(bytes)
          digest.reset()
          val sum = digest.digest(bytes).map("%02x".format(_)).mkString
          MediaFeatures(id, bytes.length.toLong, sum, w, h, luma)
        }
      }.toDF()
  }

  /** REAL (non-stub) container parsing: PNG and GIF dimensions live at
    * fixed byte offsets in the header, so width/height extraction is a
    * pure codegen'd expression over the binary column — no codec, no
    * UDF, full scan speed. (PNG: IHDR width/height big-endian at
    * offsets 17/21; GIF: logical-screen size little-endian at 7/9.)
    * Formats needing a real decoder fall through to "unknown"/null —
    * that's where [[extractFeatures]]'s per-partition decoder takes
    * over. */
  def mediaDims(df: DataFrame, binCol: String): DataFrame = {
    val b = col(binCol)
    val isPng = hex(substring(b, 1, 8)) === lit("89504E470D0A1A0A")
    val isGif = substring(b, 1, 6).cast("string").isin("GIF87a", "GIF89a")
    // JPEG has no fixed-offset header (variable APP/EXIF/table
    // segments precede the SOF), so dims come from the codegen'd
    // marker walk, packed (w << 32) | h; non-JPEG yields NULL
    val isJpeg = hex(substring(b, 1, 2)) === lit("FFD8")
    val jd = graft.functions.BinaryExprs.jpegDims(b)
    def be4(off: Int) = conv(hex(substring(b, off, 4)), 16, 10).cast("int")
    def le2(off: Int) = (conv(hex(substring(b, off + 1, 1)), 16, 10) * 256 +
      conv(hex(substring(b, off, 1)), 16, 10)).cast("int")
    df.withColumn("media_format",
        when(isPng, lit("png")).when(isGif, lit("gif"))
          .when(isJpeg, lit("jpeg")).otherwise(lit("unknown")))
      .withColumn("media_width",
        when(isPng, be4(17)).when(isGif, le2(7))
          .when(isJpeg, shiftright(jd, 32).cast("int"))
          .otherwise(lit(null).cast("int")))
      .withColumn("media_height",
        when(isPng, be4(21)).when(isGif, le2(9))
          .when(isJpeg, (jd.bitwiseAND(lit(0xFFFFFFFFL))).cast("int"))
          .otherwise(lit(null).cast("int")))
  }

  /** REAL (non-stub) audio container parsing: WAV/RIFF metadata off
    * the binary column via the codegen'd chunk walk
    * ([[graft.functions.WavMeta]] — RIFF is a variable-length chunk
    * chain like JPEG's segment chain, so a loop, not a fixed-offset
    * `substring`). Emits channels / sample rate / bit depth / declared
    * data bytes plus `wav_ms`, the clip duration in integer
    * milliseconds — all-integer arithmetic (`div`), so the value is
    * bit-reproducible across engines. Non-WAV payloads yield NULLs —
    * the decode-the-samples step stays with [[extractFeatures]]'s
    * per-partition decoder. */
  def audioMeta(df: DataFrame, binCol: String): DataFrame = {
    // _wav is referenced by four extractors, so it stays a materialized
    // attribute (CollapseProject keeps multiply-referenced non-cheap
    // aliases) — the chunk walk runs ONCE per row; wav_ms reads the
    // extracted columns, never the expression again
    val bitsPerMs = col("wav_rate") * col("wav_channels") * col("wav_bits")
    df.withColumn("_wav", graft.functions.BinaryExprs.wavMeta(col(binCol)))
      .withColumn("wav_channels", element_at(col("_wav"), 1))
      .withColumn("wav_rate", element_at(col("_wav"), 2))
      .withColumn("wav_bits", element_at(col("_wav"), 3))
      .withColumn("wav_data_bytes", element_at(col("_wav"), 4))
      .withColumn("wav_ms",
        when(bitsPerMs > 0,
          expr("(wav_data_bytes * 8000) div (wav_rate * wav_channels * wav_bits)"))
          .otherwise(lit(null).cast("long")))
      .drop("_wav")
  }

  /** REAL (non-stub) video container parsing: MP4/ISO-BMFF movie
    * metadata off the binary column via the codegen'd box walk
    * ([[graft.functions.Mp4Meta]] — variable-size big-endian boxes,
    * 64-bit largesize, children preceding mvhd inside moov). Emits
    * timescale / duration units / mvhd version plus `mp4_ms`, the
    * movie duration in integer milliseconds. Non-MP4 payloads yield
    * NULLs. Completes the container trio: image ([[mediaDims]]),
    * audio ([[audioMeta]]), video. */
  def videoMeta(df: DataFrame, binCol: String): DataFrame = {
    df.withColumn("_mp4", graft.functions.BinaryExprs.mp4Meta(col(binCol)))
      .withColumn("mp4_timescale", element_at(col("_mp4"), 1))
      .withColumn("mp4_duration", element_at(col("_mp4"), 2))
      .withColumn("mp4_version", element_at(col("_mp4"), 3))
      .withColumn("mp4_ms",
        when(col("mp4_timescale") > 0,
          expr("(mp4_duration * 1000) div mp4_timescale"))
          .otherwise(lit(null).cast("long")))
      .drop("_mp4")
  }

  /** Frame sampling on a payload: every `stride`-th BYTE of the
    * payload becomes part of the "sampled" stream — the video
    * frame-subsampling access pattern. Byte-safe: a codegen'd
    * expression over the raw binary ([[graft.functions.ByteStride]]);
    * the regex-over-string formulation it replaces round-tripped
    * through UTF-8 and corrupted real (non-text) media bytes. */
  def frameSample(df: DataFrame, binCol: String, stride: Int): DataFrame =
    df.withColumn("sample",
      graft.functions.BinaryExprs.byteStride(col(binCol), stride))

  /** Exact content dedup over a BINARY column — the multimodal twin
    * of [[Dedup.exactDedup]]: identical image/audio/video payloads
    * collapse by sha-256, keeper = min id. The first dedup pass every
    * multimodal pipeline runs (identical bytes re-crawled under
    * different ids), and the only one that needs no decoding at all.
    *
    * Scale shape: the hash is map-side over the payload bytes; the
    * canonical winner is one keyed agg with map-side partial min
    * (payloads themselves never shuffle — only (id, 64-char digest)
    * rows move); the keep labeling is a digest-keyed equi-join. */
  def binaryDedup(df: DataFrame, binCol: String, idCol: String): DataFrame = {
    val hashed = df.select(col(idCol), sha2(col(binCol), 256).as("checksum"))
    val canon = hashed.groupBy(col("checksum"))
      .agg(min(col(idCol)).as("canonical_id"))
    hashed.join(canon, Seq("checksum"))
      .select(col(idCol), col("checksum"), col("canonical_id"),
        (col(idCol) === col("canonical_id")).as("keep"))
  }

  /** 60-bit SimHash over sliding byte windows of a binary payload —
    * the NEAR-dup signature [[binaryDedup]]'s exact sha-256 can't
    * give: a re-crawled file with a prepended header, a trailing
    * corruption, or a truncation shares almost every window with the
    * original, so the sketches land within a few bits.
    *
    * Windows are `window` bytes at stride `stride` (starts 1, 1+s,
    * 2s+1, …): content shifted by any multiple of `stride` keeps every
    * interior window aligned, so the signature tolerates fixed-size
    * header insertions — choose stride to divide the header sizes the
    * crawl actually sees (8 covers the common cases). Payloads shorter
    * than one window hash as a single truncated window; EMPTY payloads
    * are excluded by contract (an empty file matches everything or
    * nothing — that call belongs to the exact pass).
    *
    * Each window is hashed via md5 of its UPPERCASE HEX form — byte
    * windows align to hex-pair windows, which is what makes the
    * sketch reproducible in engines whose md5 only takes strings.
    * Entirely map-side: length arithmetic + one `transform` per row;
    * the per-row cost is len/stride md5 calls, so at media scale size
    * `stride` up (or chunk content-defined) before hashing terabytes.
    */
  def binarySimhash(df: DataFrame, binCol: String, idCol: String,
                    window: Int = 16, stride: Int = 8): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    val BITS = 60
    val b = col(binCol)
    val len = length(b)
    val k = greatest(floor((len - lit(window)).cast("double") / lit(stride))
      .cast("int"), lit(0))
    val hs = transform(sequence(lit(0), k),
      i => Dedup.hash64(upper(hex(b.substr(i * stride + 1, lit(window))))))
    df.filter(len > 0)
      .select(col(idCol), graft.functions.SketchExprs.simhash(hs).as("simhash"))
      .select(col(idCol), lpad(bin(col("simhash")), BITS, "0").as("simbits"),
        col("simhash"))
  }

  /** Near-duplicate pairs over binary payloads: [[binarySimhash]]
    * sketches into the shared band join ([[Dedup.simhashBandPairs]]) —
    * candidates collide on a band key, verified by full-sketch Hamming
    * distance. The multimodal twin of `dedup_simhash`, and the second
    * pass of a media dedup pipeline (after [[binaryDedup]] collapses
    * byte-identical files).
    *
    * Defaults run in the EXHAUSTIVE regime: maxHamming (5) < bands
    * (6), so by pigeonhole every qualifying pair shares a clean band —
    * the result is the complete hamming-<=5 pair set, not an LSH
    * sample. (A single header insertion flips ~half the sketch's
    * zero-margin vote bits — a handful — so the guarantee is what
    * makes small-edit variants reliably pair.) */
  def binaryNearDup(df: DataFrame, binCol: String, idCol: String,
                    window: Int = 16, stride: Int = 8,
                    maxHamming: Int = 5, bands: Int = 6): DataFrame =
    Dedup.simhashBandPairs(
      binarySimhash(df, binCol, idCol, window, stride), idCol,
      maxHamming, bands)
}
