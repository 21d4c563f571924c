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

  /** MinHash signature: for hash index j, sig_j = min over shingles of
    * hash64(j:shingle). Returns (idCol, sig array<long>). Docs with no
    * shingles are dropped (no signature to compare). */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        numHashes: Int, shingleN: Int): DataFrame = {
    val sh = shingles(col(textCol), shingleN)
    df.select(col(idCol), explode(array_distinct(sh)).as("sh"))
      .select(col(idCol), explode(sequence(lit(0), lit(numHashes - 1))).as("j"), col("sh"))
      .groupBy(col(idCol), col("j"))
      .agg(min(hash64(concat(col("j"), lit(":"), col("sh")))).as("mh"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("j"), col("mh")))).as("s"))
      .select(col(idCol), transform(col("s"), x => x.getField("mh")).as("sig"))
  }

  /** LSH candidate pairs: ids sharing at least one band of the
    * signature. Band b key = sig[b*rows .. b*rows+rows-1]. */
  def lshCandidates(sigs: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val banded = sigs.select(col(idCol),
        explode(array((0 until bands).map(b => struct(lit(b).as("band"),
          concat_ws(",", (0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1)): _*).as("key"))): _*)).as("bk"))
      .select(col(idCol), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band"), col("key"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("key"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact Jaccard similarity over distinct shingle sets, computed only
    * for the given candidate pairs. */
  def verifyJaccard(df: DataFrame, textCol: String, idCol: String, shingleN: Int,
                    candidates: DataFrame): DataFrame = {
    val sets = df.select(col(idCol).as("sid"),
      explode(array_distinct(shingles(col(textCol), shingleN))).as("sh"))
    val sizes = sets.groupBy(col("sid")).agg(count(lit(1)).as("n"))
    val inter = candidates
      .join(sets.select(col("sid").as("id_a"), col("sh")), "id_a")
      .join(sets.select(col("sid").as("id_b"), col("sh").as("sh_b")), "id_b")
      .filter(col("sh") === col("sh_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("sid").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("sid").as("id_b"), col("n").as("nb")), "id_b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")))
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
    * the weighted sum of token-hash bit i is positive. */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val BITS = 60
    df.select(col(idCol), explode(words(col(textCol))).as("t"))
      .withColumn("th", hash64(col("t")))
      .select(col(idCol), col("th"),
        explode(sequence(lit(0), lit(BITS - 1))).as("i"))
      .withColumn("sign",
        when(expr("shiftrightunsigned(th, i)") % 2 === 1, 1).otherwise(-1))
      .groupBy(col(idCol), col("i"))
      .agg(sum(col("sign")).as("s"))
      .groupBy(col(idCol))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), i)")).otherwise(0L)).as("simhash"))
  }

  /** Near-dup pairs by SimHash: candidates share one of 4 15-bit bands,
    * verified with Hamming distance <= maxHamming. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 8): DataFrame = {
    val sh = simhash(df, textCol, idCol)
    val banded = sh.select(col(idCol), col("simhash"),
        explode(array((0 to 3).map(b => struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * 15).bitwiseAND(lit(0x7FFFL)).as("key"))): _*)).as("bk"))
      .select(col(idCol), col("simhash"), col("bk.band"), col("bk.key"))
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
    * n-gram become candidates (bounded by dropping n-grams that occur
    * in more than maxDf docs), then exact Jaccard >= threshold. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, threshold: Double = 0.6,
                        maxDf: Int = 100): DataFrame = {
    val sets = df.select(col(idCol).as("sid"),
      explode(array_distinct(shingles(col(textCol), n))).as("sh"))
    val rare = sets.groupBy(col("sh")).agg(count(lit(1)).as("df_count"))
      .filter(col("df_count") <= maxDf)
      .select(col("sh"))
    val filtered = sets.join(rare, "sh")
    val sizes = sets.groupBy(col("sid")).agg(count(lit(1)).as("n"))
    val inter = filtered.select(col("sh"), col("sid").as("id_a"))
      .join(filtered.select(col("sh"), col("sid").as("id_b")), "sh")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("sid").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("sid").as("id_b"), col("n").as("nb")), "id_b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")))
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
    val withB = df.select(col(idCol), col(vecCol), bucketCol.as("bucket"))
    val a = withB.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = withB.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", Vectors.cosineSim(col("va"), col("vb")))
      .filter(col("cos") >= tau)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
