package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-shaping operators for training-data pipelines: deterministic
  * stratified sampling, domain mixing, and sequence packing. All are
  * map-side or partition-parallel — none moves the corpus to fewer
  * partitions than it arrived with.
  */
object Sampling {

  private val M = 1000000L

  /** Deterministic per-stratum Bernoulli sample: keep a row iff
    * md5-hash(id) mod M < rate(stratum) * M. Pure map-side filter —
    * no shuffle, no RNG state, reproducible across runs/engines, and
    * a doc's fate never depends on partitioning. Strata missing from
    * `rates` use `defaultRate`. */
  def stratified(df: DataFrame, idCol: String, stratumCol: Column,
                 rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    val h = Dedup.hash64(col(idCol).cast("string")) % M
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(stratumCol === k, lit(r)).otherwise(acc)
    }
    df.filter(h < rateCol * M)
  }

  /** Quality-weighted deterministic sample: per-row keep probability
    * from an arbitrary rate expression (a quality score, a length
    * ramp, a source prior — any deterministic Column in [0, 1]),
    * decided by the same md5-Bernoulli rule as [[stratified]]. This
    * is importance sampling for corpus curation: instead of a hard
    * quality cutoff, high-quality docs survive at high rates and the
    * tail is thinned, not guillotined. Rates clamp to [0, 1]; NULL
    * rates drop the row (an unscorable doc is not silently kept).
    *
    * Pure map-side — no shuffle, no RNG state; a doc's fate depends
    * only on (id, its own rate), so the sample is reproducible
    * across runs, engines, and partitionings. The emitted
    * `sample_rate` column makes downstream reweighting (1/rate
    * importance weights) possible. */
  def weighted(df: DataFrame, idCol: String, rateCol: Column): DataFrame = {
    val rate = least(greatest(rateCol.cast("double"), lit(0.0)), lit(1.0))
    val h = Dedup.hash64(col(idCol).cast("string")) % M
    df.withColumn("sample_rate", rate)
      .filter(h < col("sample_rate") * M)
  }

  /** Domain-mixing rates: per-stratum sampling rates that hit
    * `weights` (target fraction of the sampled corpus per stratum) at
    * a total budget of `budgetDocs`. One groupBy-count job over the
    * corpus (the only action); rates cap at 1.0 — an under-populated
    * stratum contributes all it has (upsampling is a repeat-read
    * policy, not a sampling one). Feed the result to [[stratified]]. */
  def mixRates(df: DataFrame, stratumCol: Column,
               weights: Map[String, Double], budgetDocs: Long): Map[String, Double] = {
    val counts = df.groupBy(stratumCol.as("_s")).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    weights.map { case (s, w) =>
      val have = counts.getOrElse(s, 0L)
      s -> (if (have == 0L) 0.0 else math.min(1.0, w * budgetDocs / have))
    }
  }

  /** Temperature-scaled source mixing (the multilingual α-sampling
    * rule, public, at α = 1/2): sampling mass per source ∝ √n_i
    * instead of n_i, so low-resource sources are up-weighted without
    * a hand-tuned weight table — p_i = √n_i / Σ_j √n_j, expected
    * draw from source i = budget·p_i, per-row keep rate = that / n_i
    * (capped at 1). α = 1/2 is deliberate: `sqrt` is IEEE-correctly-
    * rounded in every engine, so rates — and therefore md5-Bernoulli
    * membership — are bit-reproducible, where a general pow(n, α)
    * can differ in the last ulp across libm implementations. The Σ
    * over sources folds in sorted source order (the float-sum rule;
    * the source list is tiny). One count job; the sample itself is
    * the zero-shuffle [[stratified]] filter. */
  def temperatureRates(df: DataFrame, stratumCol: Column,
                       budgetDocs: Long): Map[String, Double] = {
    val counts = df.groupBy(stratumCol.as("_s")).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    val z = counts.foldLeft(0.0) { case (acc, (_, n)) =>
      acc + math.sqrt(n.toDouble)
    }
    counts.map { case (s, n) =>
      s -> (if (n == 0L || z == 0.0) 0.0
        else math.min(1.0, budgetDocs.toDouble * math.sqrt(n.toDouble) / z / n.toDouble))
    }.toMap
  }

  /** Per-stratum weight expression for a driver-declared mixture:
    * strata fold in sorted key order so the when-chain (and therefore
    * the plan and every derived rate) is a pure function of the map. */
  private def weightCol(stratumCol: Column,
                        weights: Map[String, Double]): Column =
    weights.toSeq.sortBy(_._1).foldLeft(lit(0.0)) { case (acc, (k, w)) =>
      when(stratumCol === k, lit(w)).otherwise(acc)
    }

  /** Epoch-aware mixture PLAN: per stratum, the docs available, the
    * target weight, the raw rate = weight·budget / n, and its split
    * into full epochs + fractional remainder — the GPT-3-style mixing
    * table ("Wikipedia: 3.4 epochs") that [[mixRates]] deliberately
    * refuses to express (it caps at 1.0; upsampling is a repeat-read
    * policy). One strata-sized keyed count; everything after is
    * arithmetic on that frame. */
  def epochPlan(df: DataFrame, stratumCol: Column,
                weights: Map[String, Double], budgetDocs: Long): DataFrame =
    df.groupBy(stratumCol.as("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("weight", weightCol(col("source"), weights))
      .filter(col("weight") > 0.0)
      .withColumn("_rate", col("weight") * budgetDocs / col("n_docs"))
      .select(col("source"), col("n_docs"), col("weight"),
        round(col("_rate"), 5).as("rate"),
        floor(col("_rate")).as("full_epochs"),
        round(col("_rate") - floor(col("_rate")), 5).as("frac_rate"))

  /** Materialize the epoch-aware mixture: every doc of stratum s
    * repeats floor(rate_s) times, plus one extra epoch decided by the
    * [[stratified]] md5-Bernoulli at the fractional remainder — so
    * expected volume per stratum is exactly weight·budget, scarce
    * high-weight sources upsample by REPETITION (each copy tagged
    * with its `epoch` index for curriculum-aware shuffling), and
    * membership is reproducible across runs/engines/partitionings.
    *
    * Scale shape: one strata-sized keyed count; rates broadcast back
    * onto the scan; repetition is a map-side `sequence` explode —
    * fanout is the epoch count, bounded by the declared mixture, and
    * the corpus never shuffles. */
  def epochMix(df: DataFrame, idCol: String, stratumCol: Column,
               weights: Map[String, Double], budgetDocs: Long): DataFrame = {
    val rates = df.groupBy(stratumCol.as("_s")).agg(count(lit(1)).as("_n"))
      .select(col("_s"),
        (weightCol(col("_s"), weights) * budgetDocs / col("_n")).as("_rate"))
      .filter(col("_rate") > 0.0)
    val h = Dedup.hash64(col(idCol).cast("string")) % M
    val frac = col("_rate") - floor(col("_rate"))
    df.join(broadcast(rates), stratumCol === col("_s"))
      .withColumn("_reps",
        floor(col("_rate")) + when(h < frac * M, 1L).otherwise(0L))
      .filter(col("_reps") >= 1L)
      .select(df.col("*"),
        explode(sequence(lit(0L), col("_reps") - 1)).as("epoch"))
      .drop("_s", "_rate", "_reps")
  }

  /** Pack documents into fixed-size token windows ("sequence packing"
    * for LLM training): concatenate each group's docs in stable id
    * order and assign every doc the window its FIRST token lands in
    * (contiguous fill — a doc straddling a boundary belongs to the
    * window it starts in).
    *
    * Scale shape: the cumulative sum runs per `groupCol` partition
    * (Window.partitionBy — parallel across groups, never a global
    * window). Grouping is by corpus shard/source, exactly how packing
    * shards at 100 TB; window id is derived arithmetically from the
    * running token offset, no iterative bin state. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: Column,
                    groupCol: Column, windowTokens: Int): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(col(idCol).asc)
    df.withColumn("_grp", groupCol)
      .withColumn("_tok", tokensCol)
      .withColumn("_end", sum(col("_tok")).over(w))
      .withColumn("pack_id", floor((col("_end") - col("_tok")) / windowTokens))
      .drop("_end")
      .withColumnRenamed("_grp", "pack_group")
      .withColumnRenamed("_tok", "pack_tokens")
  }

  /** Deterministic global shuffle + sharding for training export:
    * every row gets a `shuffle_key` (md5 hash of seed + id — change
    * the seed, get an independent permutation), a `shard` (key mod
    * numShards), and `shard_pos` (its rank within the shard). Writing
    * `partitionBy(shard) sortBy(shard_pos)` yields the randomized,
    * evenly-sized shards a training loader streams.
    *
    * Scale shape: key and shard are map-side; the only shuffle is the
    * per-shard rank window, partitioned by shard — so parallelism =
    * numShards, and a 100 TB export picks numShards >> executors
    * (which it wants anyway for loader-side parallelism). No global
    * orderBy anywhere; reproducible across runs, engines, and
    * partitionings. */
  def shuffleShards(df: DataFrame, idCol: String, seed: String,
                    numShards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key").asc, col(idCol).asc)
    df.withColumn("shuffle_key",
        Dedup.hash64(concat(lit(seed), lit("_"), col(idCol).cast("string"))))
      .withColumn("shard", pmod(col("shuffle_key"), lit(numShards.toLong)).cast("int"))
      .withColumn("shard_pos", row_number().over(w).cast("bigint"))
  }

  /** Per-window packing stats: docs and token mass per (group,
    * window) — the frame a packing loader consumes. */
  def packStats(df: DataFrame, idCol: String, tokensCol: Column,
                groupCol: Column, windowTokens: Int): DataFrame =
    packSequences(df, idCol, tokensCol, groupCol, windowTokens)
      .groupBy(col("pack_group"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("pack_tokens")).as("tokens"))

  /** Exactly-k deterministic sample per stratum: rank rows by the
    * md5 hash of (seed, id) and keep each stratum's k smallest — the
    * complement of [[stratified]] (Bernoulli gives rate-exact-in-
    * expectation; this gives COUNT-exact, the contract an eval-set
    * builder needs). Same determinism properties: seed-keyed,
    * engine-reproducible, independent of partitioning.
    *
    * Shape: the hash is map-side; per-stratum top-k is a bounded
    * [[graft.functions.TopKAgg]] — ≤ k rows per partition per stratum
    * survive the map side, so the one shuffle moves
    * O(partitions × k × strata) rows, never a stratum's full
    * population. No windows. idCol must be integral. */
  def exactSample(df: DataFrame, idCol: String, stratumCol: Column, k: Int,
                  seed: String): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    import graft.functions.TopKAgg
    val h = Dedup.hash64(concat(lit(seed), lit("_"), col(idCol).cast("string")))
    df.select(stratumCol.as("stratum"), col(idCol), h.cast("double").as("_h"))
      .groupBy(col("stratum"))
      .agg(TopKAgg.topk(col("_h"), col(idCol).cast("long"), k).as("_top"))
      .select(col("stratum"), posexplode(col("_top")).as(Seq("_pos", "_t")))
      .select(col("stratum"), col("_t.id").as(idCol),
        (col("_pos") + 1).as("sample_rank"))
  }

  /** Quantile-stratified sampling over a NUMERIC column — the
    * distribution-balanced draw ([[balancedSample]] balances a label;
    * this balances a measurement): split the value range into `bins`
    * equal-population strata at sampled quantile thresholds, then
    * draw exactly `perBin` rows from each — the "equal counts from
    * every length/score band" sample an eval set or an annotation
    * batch is built from.
    *
    * Scale shape: thresholds come from the deterministic
    * [[graft.functions.SampleValuesAgg]] k-min-hash sample (≤
    * `sampleK` pairs per partition, one reduce row — never a corpus
    * sort); bin assignment is one map-side HOF comparison against the
    * broadcast (bins−1)-entry threshold array (ties: a value equal to
    * a threshold falls in the LOWER bin); the draw is
    * [[exactSample]]'s seed-keyed (hash, id) rank per bin — bounded
    * TopKAgg, ≤ perBin rows per bin per partition map-side. Both hash
    * streams are md5-derived and distinct (threshold sampling vs
    * draw), so the whole output is engine- and
    * partitioning-reproducible. */
  def quantileStrata(df: DataFrame, idCol: String, valCol: String,
                     bins: Int, perBin: Int, sampleK: Int = 256,
                     seed: String = "qs0"): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(perBin > 0, s"perBin must be > 0, got $perBin")
    require(sampleK >= bins, s"sampleK must be >= bins, got $sampleK")
    val base = df.filter(col(valCol).isNotNull)
      .select(col(idCol), col(valCol).cast("double").as("_v"))
    val hT = Dedup.hash64(concat(lit(seed + "_t_"), col(idCol).cast("string")))
    val th = base.select(hT.cast("double").cast("long").as("_h"), col("_v"))
      .agg(graft.functions.SampleValuesAgg
        .sampleValues(col("_h"), col("_v"), sampleK).as("_vs"))
      .select(transform(sequence(lit(1), lit(bins - 1)),
        i => element_at(col("_vs"),
          (floor(i.cast("double") / bins * (size(col("_vs")) - 1)) + 1)
            .cast("int"))).as("_ths"))
    val binned = base.crossJoin(broadcast(th))
      .select(col(idCol), col("_v"),
        size(filter(col("_ths"), t => col("_v") > t)).cast("long").as("bin"))
    exactSample(binned, idCol, col("bin"), perBin, seed)
      .join(binned.select(col(idCol), col("_v").as("value")), Seq(idCol))
      .select(col(idCol), col("value"), col("stratum").as("bin"),
        col("sample_rank"))
  }

  /** Class-balanced sampling: exactly `min-class-count` rows from
    * EVERY stratum — the downsample-majority-classes step before
    * training a classifier on skewed labels (the balance every
    * `classify_nb`-style trainer wants). The cap is derived from the
    * data (one keyed count job, broadcastable strata-sized result),
    * then the sample is [[exactSample]]'s deterministic (hash, id)
    * rank per stratum — seed-keyed, engine-reproducible, independent
    * of partitioning, and the bounded TopKAgg keeps ≤ cap rows per
    * stratum per partition map-side. */
  def balancedSample(df: DataFrame, idCol: String, stratumCol: Column,
                     seed: String): DataFrame = {
    import graft.functions.TopKAgg
    val counts = df.groupBy(stratumCol.as("stratum"))
      .agg(count(lit(1)).as("_n"))
    // strata-sized by contract (a label column, not a key column)
    val cap = counts.agg(min(col("_n"))).head().getLong(0).toInt
    require(cap > 0, "balancedSample needs at least one row per stratum")
    val h = Dedup.hash64(concat(lit(seed), lit("_"), col(idCol).cast("string")))
    df.select(stratumCol.as("stratum"), col(idCol), h.cast("double").as("_h"))
      .groupBy(col("stratum"))
      .agg(TopKAgg.topk(col("_h"), col(idCol).cast("long"), cap).as("_top"))
      .select(col("stratum"), posexplode(col("_top")).as(Seq("_pos", "_t")))
      .select(col("stratum"), col("_t.id").as(idCol),
        (col("_pos") + 1).as("sample_rank"))
  }

  /** Leakage-safe train/eval split: near-duplicate documents must
    * never straddle the boundary (a doc whose near-copy sits in the
    * training set leaks into eval), so the split unit is the near-dup
    * CLUSTER, not the doc. `pairs` is any near-dup pair frame
    * (`id_a`, `id_b` — minhash, simhash, embedding, …); docs in the
    * same connected component share a `split_key` (the component's
    * min id), singletons key on themselves, and the whole cluster
    * lands on one side via the same md5-Bernoulli rule [[stratified]]
    * uses — deterministic, seed-keyed, engine-reproducible.
    *
    * Scale shape: the cluster frame is pair-graph-sized (≪ corpus),
    * the label join back is broadcast-able, and the split decision is
    * pure map-side arithmetic — no shuffle beyond the one label join,
    * and the eval fraction holds in expectation regardless of
    * partitioning. */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       evalFrac: Double, seed: String,
                       checkpointDir: Option[String] = None): DataFrame = {
    val clusters = Dedup.connectedComponents(
      pairs.select(col("id_a"), col("id_b")), checkpointDir = checkpointDir)
    val key = coalesce(col("cluster_id"), col(idCol).cast("long"))
    val h = Dedup.hash64(concat(lit(seed), lit("_"), key.cast("string"))) % M
    df.join(clusters.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .withColumn("split_key", key)
      .withColumn("split",
        when(h < lit(evalFrac) * M, lit("eval")).otherwise(lit("train")))
      .drop("cluster_id")
  }

  /** Leakage-safe k-FOLD assignment — the cross-validation shape of
    * [[leakageSafeSplit]]: the split unit is the near-dup CLUSTER
    * (component min id; singletons key on themselves), and the fold
    * is `hash64(seed_unit) mod k` — so every member of a near-dup
    * cluster lands in the SAME fold and no fold's held-out set ever
    * contains a near-duplicate of another fold's training data.
    * Deterministic, partitioning-independent, and map-side after the
    * one label join (the cluster frame is pair-graph-sized — AQE
    * broadcasts it; the corpus never shuffles). */
  def kfoldSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                 k: Int, seed: String,
                 checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 2, s"k-fold needs k >= 2, got $k")
    val clusters = Dedup.connectedComponents(
      pairs.select(col("id_a"), col("id_b")), checkpointDir = checkpointDir)
    val key = coalesce(col("cluster_id"), col(idCol).cast("long"))
    df.join(clusters.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .withColumn("split_key", key)
      .withColumn("fold",
        pmod(Dedup.hash64(concat(lit(seed), lit("_"), key.cast("string"))),
          lit(k.toLong)).cast("int"))
      .drop("cluster_id")
  }

  /** Temporal train/eval split with an EMBARGO gap — the time-series
    * complement of [[leakageSafeSplit]]: eval = rows at or after
    * `cutoff`; train = rows at least `embargoSeconds` BEFORE the
    * cutoff; rows inside the embargo window are labeled `embargo` and
    * excluded from both sides, so features computed over trailing
    * windows (a 7-day rolling mean, an as-of join) can never read
    * data that leaks across the boundary. Pure map-side — zero
    * shuffles, the label rides the scan at any scale. */
  def temporalSplit(df: DataFrame, tsCol: String, cutoff: String,
                    embargoSeconds: Long): DataFrame = {
    require(embargoSeconds >= 0,
      s"embargo must be non-negative, got $embargoSeconds")
    val ts = col(tsCol).cast("timestamp")
    val cut = lit(cutoff).cast("timestamp")
    df.withColumn("split",
      when(ts >= cut, lit("eval"))
        .when(ts <= cut - expr(s"INTERVAL $embargoSeconds SECOND"),
          lit("train"))
        .otherwise(lit("embargo")))
  }

  /** DSIR importance weights (Data Selection via Importance
    * Resampling, Xie et al., NeurIPS 2023 — public): score every raw
    * document by how much more likely its hashed-n-gram profile is
    * under the TARGET distribution than under the raw one,
    * `log w(x) = Σ_grams [ln p_target(bucket) − ln p_raw(bucket)]`
    * with Laplace-smoothed bag-of-hashed-grams models (unigrams +
    * bigrams hashed into `buckets`). This is the published
    * scale-proof recipe for "make 100 TB of crawl look like
    * Wikipedia": both models are bucket-count tables, never
    * vocabularies.
    *
    * Scale shape: both count tables are ONE aggregation each with an
    * `Array[Long](buckets)` buffer
    * ([[graft.functions.DsirGramCountsAgg]] — an array-index
    * increment per gram, instead of the exploded row + hash-probe per
    * gram the Column formulation paid; partials merge by vector
    * addition), bounded at `buckets` longs per partition BY
    * CONSTRUCTION regardless of corpus size. The model collapses to
    * `buckets` doubles on the driver (the trainNaiveBayes model-sized
    * collect contract) and rides the scoring plan inside the
    * codegen'd [[graft.functions.DsirScore]] kernel — each doc's
    * weight is one tight-loop fold over its own gram sequence
    * (unigrams in position order, then bigrams; plain SUM order is
    * engine-unspecified), ZERO joins, zero corpus-side shuffles. All
    * ln inputs are integer-derived ratios, so weights reproduce
    * exactly across engines and partitionings.
    *
    * Output: (idCol, n_grams, dsir_logw) — one row per raw doc;
    * token-less docs score 0.0 over 0 grams (weighting is a signal,
    * not a filter). `dsir_logw` is NOT length-normalized, matching
    * the paper (longer docs move further from 0). */
  /** The filtered word array the DSIR gram sequence derives from —
    * shared by training, scoring, and the deployment paths so their
    * gram walks stay bit-identical (the kernels visit unigrams in
    * position order, then bigrams built with a single-space join). */
  private def dsirWords(tc: String): Column =
    filter(split(coalesce(col(tc), lit("")), " "), t => t =!= "")

  /** Batch weights = [[trainDsir]] + [[dsirScoreAll]]: the batch path
    * IS the deployment split, so the two can never drift — and the
    * scoring pass runs the codegen'd kernel either way. */
  def dsirWeights(raw: DataFrame, idCol: String, textCol: String,
                  target: DataFrame, targetTextCol: String,
                  buckets: Int = 4096): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    dsirScoreAll(raw, idCol, textCol,
      trainDsir(raw, textCol, target, targetTextCol, buckets))
  }

  /** Train the DSIR model once, driver-side: the dense bucket-ordered
    * logratio array, collected under the model-sized contract
    * (exactly `buckets` doubles regardless of corpus size — the
    * trainNaiveBayes split). Feed it to [[dsirScoreAll]] to score any
    * frame — including a streaming micro-batch
    * ([[graft.streaming.Ingest.dsirStream]]) — without re-reading
    * either training corpus. */
  def trainDsir(raw: DataFrame, textCol: String, target: DataFrame,
                targetTextCol: String, buckets: Int = 4096): Array[Double] = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    dsirModelRow(raw, textCol, target, targetTextCol, buckets)
      .head().getSeq[Double](0).toArray
  }

  /** The one-row dense model array behind [[trainDsir]]: ONE
    * histogram aggregation per corpus (exactly 2 corpus FileScans,
    * plan-pinned in SamplingSpec — the r13 shape re-aggregated the
    * corpus for its totals and paid 4), crossJoined 1-row x 1-row,
    * then the per-bucket logratio via `zip_with` in bucket (= array
    * index) order. Totals are the column sums of the histograms
    * (every gram lands in exactly one bucket), and the model covers
    * the FULL bucket range (ADVICE r12): raw-unseen buckets hold the
    * Laplace-smoothed logratio with nr = 0 — target-only buckets
    * score target-like, both-unseen buckets the neutral constant —
    * so NEW documents score correctly in deployment. */
  private[graft] def dsirModelRow(raw: DataFrame, textCol: String,
                                  target: DataFrame, targetTextCol: String,
                                  buckets: Int): DataFrame = {
    def hist(df: DataFrame, tc: String): DataFrame =
      df.select(dsirWords(tc).as("_w"))
        .agg(graft.functions.DsirExprs.gramCounts(col("_w"), buckets).as("_h"))
    hist(raw, textCol).select(col("_h").as("_hr"))
      .crossJoin(hist(target, targetTextCol).select(col("_h").as("_ht")))
      .select(col("_hr"), col("_ht"),
        aggregate(col("_hr"), lit(0L), (a, x) => a + x).as("_tr"),
        aggregate(col("_ht"), lit(0L), (a, x) => a + x).as("_tt"))
      .select(zip_with(col("_ht"), col("_hr"), (nt, nr) =>
        log((nt + lit(1.0)) / (col("_tt") + lit(buckets)))
          - log((nr + lit(1.0)) / (col("_tr") + lit(buckets)))).as("_m"))
  }

  /** Score any frame against a trained DSIR model: the model rides
    * the plan inside the codegen'd kernel — zero joins, zero
    * shuffles, bit-identical to [[dsirWeights]] (it IS dsirWeights'
    * scoring path), and it runs unchanged inside a streaming
    * micro-batch. */
  def dsirScoreAll(df: DataFrame, idCol: String, textCol: String,
                   model: Array[Double]): DataFrame = {
    require(model.nonEmpty, "dsirScoreAll needs a non-empty model")
    df.select(col(idCol),
        graft.functions.DsirExprs.scoreCol(dsirWords(textCol), model).as("_s"))
      .select(col(idCol), col("_s.n_grams").as("n_grams"),
        col("_s.dsir_logw").as("dsir_logw"))
  }

  /** DSIR resampling on top of [[dsirWeights]]: the paper's
    * Gumbel-top-k trick — `key = log w(x) + Gumbel(0,1)` and take the
    * k largest keys — draws EXACTLY the softmax-weighted sample
    * without ever normalizing the weights (the normalizer is a
    * corpus-wide constant that cancels in the ordering). The Gumbel
    * noise is the deterministic md5 uniform used by every sampler in
    * this file (`u = (hash64(id) mod M + 0.5) / M`, shifted off 0 and
    * 1 so the double log is always finite), so the draw is
    * reproducible across runs, engines, and partitionings.
    *
    * One TakeOrdered over map-side keys — no shuffle of the corpus,
    * no window; ties break on id. Returns (idCol, n_grams,
    * dsir_logw, gumbel_key) for the k selected docs. */
  def dsirSample(raw: DataFrame, idCol: String, textCol: String,
                 target: DataFrame, targetTextCol: String, k: Int,
                 buckets: Int = 4096): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val u = (Dedup.hash64(col(idCol).cast("string")) % M
      + lit(0.5)).cast("double") / M
    dsirWeights(raw, idCol, textCol, target, targetTextCol, buckets)
      .withColumn("gumbel_key", col("dsir_logw") - log(-log(u)))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }
}
