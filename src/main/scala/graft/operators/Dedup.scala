package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines:
  * exact (hash groupBy), MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * All hashing is md5-derived (deterministic across engines and runs —
  * no seeded RNG state on executors), so every operator here is
  * reproducible and oracle-checkable.
  *
  * Scale posture: nothing is O(n²). Candidate generation always goes
  * through an equi-join key (hash, LSH band, simhash band, shared
  * n-gram), so Spark executes shuffle-partitioned hash joins whose
  * fanout is bounded by bucket size; AQE handles residual skew. Exact
  * verification (Jaccard / Hamming) runs only on candidate pairs.
  */
object Dedup {

  /** 60-bit deterministic hash: first 15 hex chars of md5, as a long. */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Single-space tokenization (the corpus is space-joined words). */
  def words(text: Column): Column = split(text, " ")

  /** Word n-gram shingles as strings; empty array when the text is
    * shorter than n words. */
  def shingles(text: Column, n: Int): Column = {
    val w = words(text)
    when(size(w) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*)))
  }

  // ---------- exact ----------

  /** Exact duplicate groups: md5 text hash → (canonical min id, count).
    * Map-side partial aggregation; one shuffle on the 128-bit hash. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("dup_count"))

  /** Keep one row per distinct text (the min-id row). */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = exactGroups(df, textCol, idCol)
      .select(col("canonical_id").as(idCol))
    df.join(keep, idCol)
  }

  // ---------- MinHash + LSH ----------

  /** Modulus for the universal-hash family (Mersenne prime 2^31-1):
    * products a*(h%M) stay under 2^62, no BIGINT overflow in either
    * engine. */
  val MINHASH_M: Long = 2147483647L

  /** Per-function universal-hash constants, md5-derived (deterministic,
    * engine-independent): a_j in [1, M-1], b_j in [0, M-1]. */
  def minhashConsts(numHashes: Int): (Seq[Long], Seq[Long]) = (
    (0 until numHashes).map(j => AnnLsh.hash64Local(s"a:$j") % (MINHASH_M - 1) + 1),
    (0 until numHashes).map(j => AnnLsh.hash64Local(s"b:$j") % MINHASH_M))

  /** MinHash signature: base-hash each distinct shingle once (md5),
    * then sig_j = min over shingles of the universal hash
    * (a_j * (h % M) + b_j) % M.
    *
    * Entirely map-side — ZERO shuffles. The signature is ONE
    * `aggregate` traversal carrying all numHashes running minima, so
    * each shingle is hashed exactly once. (A naive per-j formulation
    * re-evaluates the md5 pipeline numHashes times at runtime — the
    * optimizer inlines aliases referenced inside lambdas — and
    * measured 10x slower.) Docs shorter than the shingle width are
    * dropped with a cheap word-count filter (no hashing). */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        numHashes: Int, shingleN: Int): DataFrame = {
    val (as, bs) = minhashConsts(numHashes)
    val hs = transform(array_distinct(shingles(col(textCol), shingleN)),
      s => hash64(s) % MINHASH_M)
    df.filter(size(words(col(textCol))) >= shingleN)
      .select(col(idCol),
        graft.functions.SketchExprs.minhashSig(hs, as, bs, MINHASH_M).as("sig"))
  }

  /** LSH candidate pairs: ids sharing at least one band of the
    * signature. Band b key = sig[b*rows .. b*rows+rows-1].
    *
    * The band index is exploded BEFORE the key projection so `sig` is
    * a materialized Generate output when the 4 keys are sliced from
    * it — a pre-explode array-of-structs formulation made the
    * optimizer inline the whole signature pipeline into every key. */
  def lshCandidates(sigs: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = sigs
      .select(col(idCol), col("sig"),
        explode(typedlit((0 until bands).toList)).as("band"))
      .select(col(idCol), col("band"),
        concat_ws(",", slice(col("sig"), col("band") * rowsPerBand + 1,
          lit(rowsPerBand)).cast("array<string>")).as("key"))
    val a = banded.select(col("band"), col("key"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("key"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard similarity over distinct shingle-hash sets, computed
    * only for the given candidate pairs: each doc carries ONE compact
    * array of hashed shingles, and a pair costs one codegen'd
    * `array_intersect` — no per-shingle explode/shuffle in the
    * verification step. */
  def verifyJaccard(df: DataFrame, textCol: String, idCol: String, shingleN: Int,
                    candidates: DataFrame): DataFrame = {
    val sets = df.select(col(idCol).as("sid"),
      array_distinct(transform(shingles(col(textCol), shingleN), s => hash64(s))).as("shs"))
    candidates
      .join(sets.select(col("sid").as("id_a"), col("shs").as("sa")), "id_a")
      .join(sets.select(col("sid").as("id_b"), col("shs").as("sb")), "id_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("inter")))
      .drop("sa", "sb")
  }

  /** Full MinHash+LSH near-dup pipeline → verified pairs above τ. */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
                   numHashes: Int = 16, bands: Int = 4, shingleN: Int = 3,
                   threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val sigs = minhashSignatures(df, textCol, idCol, numHashes, shingleN)
    val cands = lshCandidates(sigs, idCol, bands, numHashes / bands)
    verifyJaccard(df, textCol, idCol, shingleN, cands)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---------- SimHash ----------

  /** 60-bit SimHash over tokens (with multiplicity): bit i is set when
    * the weighted sum of token-hash bit i is positive.
    *
    * One map-side `aggregate` traversal folds all 60 bit-counters at
    * once (tokens are md5-hashed exactly once; bit i is read with
    * integer arithmetic — `h mod 2^(i+1) >= 2^i` — because bit-shift
    * builtins only take literal shift amounts and string-based bit
    * access allocates per token). No explode, no shuffle — SimHash
    * rides the scan at any scale. Emits both the packed long
    * (`simhash`) and the MSB-first bit string (`simbits`, cheap to
    * slice into LSH band keys). */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val BITS = 60
    val hs = transform(words(col(textCol)), t => hash64(t))
    df.select(col(idCol),
        graft.functions.SketchExprs.simhash(hs).as("simhash"))
      // MSB-first bit string, sliceable by column offsets for band keys
      .select(col(idCol), lpad(bin(col("simhash")), BITS, "0").as("simbits"),
        col("simhash"))
  }

  /** Near-dup pairs by SimHash: candidates share one of 4 15-bit bands,
    * verified with Hamming distance <= maxHamming. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 8): DataFrame = {
    val sh = simhash(df, textCol, idCol)
    // explode the band index first (see lshCandidates for why), then
    // slice the 15-bit band key out of the bit STRING — substring
    // accepts column offsets where bit-shifts do not
    val banded = sh
      .select(col(idCol), col("simhash"), col("simbits"),
        explode(typedlit((0 to 3).toList)).as("band"))
      .select(col(idCol), col("simhash"), col("band"),
        col("simbits").substr(lit(46) - col("band") * 15, lit(15)).as("key"))
    val a = banded.select(col("band"), col("key"), col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("key"), col(idCol).as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---------- n-gram Jaccard (inverted index) ----------

  /** Near-dup pairs via an n-gram inverted index: docs sharing >= 1
    * rare n-gram become candidates (n-grams occurring in more than
    * maxDf docs are dropped from the index — ubiquitous shingles only
    * create quadratic candidate fanout), then exact Jaccard over the
    * FULL shingle sets (one array_intersect per pair) >= threshold. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, threshold: Double = 0.6,
                        maxDf: Int = 100): DataFrame = {
    val sets = df.select(col(idCol).as("sid"),
      explode(array_distinct(transform(shingles(col(textCol), n), s => hash64(s)))).as("sh"))
    val rare = sets.groupBy(col("sh")).agg(count(lit(1)).as("df_count"))
      .filter(col("df_count") <= maxDf)
      .select(col("sh"))
    val filtered = sets.join(rare, "sh")
    val cands = filtered.select(col("sh"), col("sid").as("id_a"))
      .join(filtered.select(col("sh"), col("sid").as("id_b")), "sh")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    verifyJaccard(df, textCol, idCol, n, cands)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---------- embedding cosine near-dup ----------

  /** Near-dup pairs by embedding cosine similarity >= tau, with
    * candidates bucketed by a coarse key (e.g. an LSH bucket or label)
    * so the self-join is per-bucket, never all-pairs. */
  def embeddingPairs(df: DataFrame, vecCol: String, idCol: String,
                     bucketCol: Column, tau: Double): DataFrame = {
    import graft.functions.Vectors
    // normalize once per row before the join: each pair then costs one
    // dot product instead of a dot plus two norms
    val withB = df.select(col(idCol),
      Vectors.normalize(col(vecCol)).as("_nv"), bucketCol.as("bucket"))
    val a = withB.select(col("bucket"), col(idCol).as("id_a"), col("_nv").as("na"))
    val b = withB.select(col("bucket"), col(idCol).as("id_b"), col("_nv").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        least(greatest(Vectors.dot(col("na"), col("nb")), lit(-1.0)), lit(1.0)))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
