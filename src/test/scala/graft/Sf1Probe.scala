package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-protocol bench of the most expensive graded queries at an
  * sf1-scale dataset (10x sf0.1): documents/embeddings replicate 10x
  * with DISTINCT content (every word of a copy carries a copy suffix;
  * vectors perturb per copy) — this probes 10x-more-DATA scaling, not
  * the duplicate-torture shape TextScaleProbe covers. Protocol mirrors
  * graft.Bench exactly: local[32], toRdd.count of the query's own
  * plan, sf0.001 JIT warm-up, one full warm pass, then median of 3
  * interleaved passes. Prints per-query sf1/sf0.1 ratios; the pass bar
  * is ratio <= ~12x (near-linear) with no outlier. A full (no-arg)
  * run writes SF1_PROBE.json — the committed, regenerable artifact
  * behind SURVEY §4's scale table (VERDICT r17 #6); filtered and
  * export-only runs print but never overwrite the artifact.
  * Run: sbt "Test/runMain graft.Sf1Probe" */
object Sf1Probe {
  private val names = Seq(
    "dedup_eval", "dedup_incremental", "dedup_ngram", "dedup_canonical",
    "pipeline_curate", "split_kfold", "split_safe",
    "dedup_simhash", "remove_boilerplate", "bm25_batch",
    // not a top-10 line: the one unexplained r7 regression (0.65 ->
    // 0.85 s), re-measured here under the driver protocol (verdict #3)
    "dedup_minhash",
    // events family at 10x users (r9 verdict #8): windows/sessions/
    // paths scale per-user, pmi's self-join is bounded by type
    // cardinality, quantiles' sample agg is <= k per group — each
    // claim gets a measured ratio here
    "events_funnel", "events_sessionize", "events_paths",
    "events_pmi", "events_quantiles",
    // O(corpus tokens) by design — the ratio here verifies the token
    // shuffles scale linearly, not quadratically; both variants now
    // share the agg+join shape (keep-first adds the first-occurrence
    // struct to the agg) and each gets its own ratio
    "dedup_substring", "dedup_substring_keep",
    // round-11 additions: NB training is two keyed aggs over 10x
    // tokens (model stays buckets x labels); the kernel variant pays
    // the same training cost but scores at scan speed; more_like_this
    // band-blocks 10x seeds against a 10x corpus; keep_best re-runs
    // the minhash pair chain + cluster-sized winner aggs at 10x
    "classify_nb", "classify_nb_scored", "more_like_this",
    "dedup_keep_best",
    // indexed retrieval probe (index build amortized by builtIndexes,
    // so the timed region is the probe) and the round-11 composition
    "more_like_this_indexed", "pipeline_curate_v2",
    // the continuation additions: map-side reports, balanced/binary
    // dedup sampling, the rolling-WAU fanout, the overlap roll-up and
    // the three-config sweep (3x pair chains + shared ngram truth)
    "quality_gopher", "sample_balanced", "mm_dedup",
    "events_rolling_distinct", "corpus_overlap", "dedup_minhash_sweep",
    // round-12 additions with corpus-sized inputs: DSIR (gram-count
    // model build + map-side scoring), bloom decontamination (bitmap
    // build bounded, corpus pass map-side), the NB calibration roll-up
    // (chain + label-sized aggs), covariance/PCA (HOF fan-out +
    // bounded partials), binary near-dup (sliding-window sketches),
    // and the indexed overlap report (probe posture vs re-signing).
    // NOT probed: entity_resolution / graph_pagerank (their
    // part/orders/lineitem inputs are copied verbatim into the
    // replica — no 10x axis to measure) and knn_classify (exact
    // brute-force baseline is O(queries x corpus) BY DESIGN — its
    // scale path is the ann_batch/forest retrieval, measured above)
    "sample_dsir", "decontaminate_bloom", "classify_nb_calibration",
    "embedding_covariance", "embedding_pca", "mm_near_dedup",
    "corpus_overlap_indexed", "embedding_outliers",
    // BPE touches the corpus once (word-vocab groupBy) then iterates
    // on the vocabulary — which GROWS 10x here (copy-suffixed words),
    // the worst case for the iteration cost; cooccurrence fans out
    // window x tokens pairs map-side; the nprobe sweep re-runs three
    // probe widths over the 10x index
    "tokenize_bpe_train", "corpus_cooccurrence", "ann_nprobe_sweep",
    "pipeline_pretrain_v3",
    // second-continuation additions with a 10x axis: boost training
    // (3 rounds x corpus-crossed-candidate agg — the candidate frame
    // grows with distinct word counts), the source sketch matrix (one
    // KMV agg over 10x shingles), CCNet bucketing (the lm_score chain
    // + sampled thresholds), the cluster histogram (CC at 10x pairs)
    // and whitening (map-side folds). mine_triplets probes via the
    // SCALED entry below: like every forest-family line, its bucket
    // bits must grow with corpus size to hold per-bucket occupancy
    // constant — probing the sf0.1-tuned 8 bits at sf1 measured the
    // saturated-forest shape (1.25e8 candidates from 22k vectors,
    // 143x), not data growth
    "classify_boost", "source_similarity", "perplexity_buckets",
    "dedup_cluster_stats", "embedding_whiten",
    // quantile strata (sample agg + TopKAgg draw over 10x docs),
    // Holt forecast (daily grid over 10x events), the stage-count
    // funnel (the v3 chain + 7 single-row aggs)
    "sample_length_strata", "events_forecast", "pipeline_report",
    // heavy hitters: 10x tokens through <= k MG counters/partition,
    // then the candidate-only recount
    "corpus_heavy_hitters", "ann_bits_sweep",
    // soft dedup re-runs the pair chain + one size count; the
    // centroid router is one bounded agg + map-side scoring
    "dedup_soft", "classify_centroid",
    // round-15: the calibrated linear classifier — model cached per
    // dir (trained once in the warm pass over the 10x signal frame),
    // so like classify_boost the timed region is map-side scoring;
    // the report's decile agg rides the same scan
    "classify_logreg", "classify_logreg_report",
    // round-16: the d=6 signal extraction (six HOF counts per doc vs
    // the base model's two) and the NB deploy forms (scan-speed
    // kernel over the cached model — the family's timed region is now
    // one zero-join pass, which should scale exactly linearly); the
    // capped forest path probes via the SCALED entry below (like
    // every forest line, its bucket bits grow with the corpus)
    "classify_logreg_multi", "classify_nb", "classify_nb_unseen")

  def main(args: Array[String]): Unit = {
    // r20 (VERDICT r19 #8): honor SPARK_GRAFT_CPUS so the same probe
    // measures the c8/c32 CORE ratio at sf1 — sf0.1's 0.2-1.5 s lines
    // are fixed construction cost and read ~1.0 on that ratio, so the
    // scaling evidence needs the 10x dataset. Default unchanged (32);
    // name-filtered runs never overwrite the committed artifact, and
    // a full (no-arg) run at non-default cpus refuses to export too —
    // SF1_PROBE.json history is 32-core only.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // older testdata generations carry TIMESTAMP(NANOS) events: read
      // the raw long so the verbatim copy stays readable; the
      // schema-adaptive Tables.events handles either copy layout
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = "/root/testdata/sf0.1"
    val dst = "/tmp/sf1rep"
    val out = new ProbeJson("sf1", "/root/repo/SF1_PROBE.json")
    var replicaMd5 = ""

    if (!new java.io.File(s"$dst/documents.parquet").exists()) {
      println("[sf1probe] building /tmp/sf1rep (10x sf0.1, distinct content)")
      // PINNED LAYOUT (round-12): hash-partition on the id + sort
      // within partitions, so every rebuild lays out byte-identical
      // parquet — the r11 cross-era band widening for the forest lines
      // traced to a replica rebuild changing file layout (row-group
      // boundaries move scan/shuffle granularity), which made eras
      // incomparable. The md5 manifest below makes any future layout
      // change loud instead of silent.
      val docs = spark.read.parquet(s"$src/documents.parquet")
      (0 until 10).map { n =>
        if (n == 0) docs
        else docs.select(
          (col("doc_id") + n * 1000000L).as("doc_id"),
          array_join(transform(split(coalesce(col("text"), lit("")), " "),
            w => concat(w, lit(s"_c$n"))), " ").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        .repartition(32, col("doc_id")).sortWithinPartitions("doc_id")
        .write.mode("overwrite").parquet(s"$dst/documents.parquet")
      // perturbation 0.2/dim on unit-norm vectors moves copies to
      // cos ~ 0.6-0.7 from their original: genuinely DISTINCT content
      // (a 0.05 perturbation left every copy a near-dup above tau,
      // which measures duplicate saturation, not data growth)
      val emb = spark.read.parquet(s"$src/embeddings.parquet")
      (0 until 10).map { n =>
        if (n == 0) emb
        else emb.select(
          (col("vec_id") + n * 1000000L).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x.cast("double") +
              sin((col("vec_id") + i * 7 + lit(n * 13)).cast("double")) * 0.2)
              .cast("float")).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
        .repartition(32, col("vec_id")).sortWithinPartitions("vec_id")
        .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
      // events replicate 10x with DISTINCT users (ids shifted per
      // copy, timestamps kept): 10x the user population and event
      // volume, the growth axis every per-user events operator
      // shuffles on
      val ev = graft.core.Tables.events(spark, src)
      (0 until 10).map { n =>
        if (n == 0) ev
        else ev.select(
          (col("event_id") + n * 10000000L).as("event_id"), col("ts"),
          (col("user_id") + n * 10000000L).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)
        .repartition(32, col("event_id")).sortWithinPartitions("event_id")
        .write.mode("overwrite").parquet(s"$dst/events.parquet")
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem"))
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

    // Byte-level manifest over the probe tables: md5 of every data
    // file, combined in sorted-name order. First build writes it;
    // every later run verifies, so a replica whose BYTES differ from
    // the era being compared against can never masquerade as the same
    // dataset (VERDICT r11 #2 / SURVEY round-12 note).
    locally {
      def md5File(f: java.io.File): String = {
        val d = java.security.MessageDigest.getInstance("MD5")
        val in = new java.io.FileInputStream(f)
        try {
          val buf = new Array[Byte](1 << 20)
          var n = in.read(buf)
          while (n >= 0) { d.update(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        d.digest().map("%02x".format(_)).mkString
      }
      val combined = java.security.MessageDigest.getInstance("MD5")
      for (t <- Seq("documents", "embeddings", "events")) {
        val files = new java.io.File(s"$dst/$t.parquet").listFiles()
          .filter(f => f.getName.endsWith(".parquet") &&
            !f.getName.startsWith("_") && !f.getName.startsWith("."))
          .sortBy(_.getName)
        files.foreach(f => combined.update(
          (f.getName + ":" + md5File(f)).getBytes("UTF-8")))
      }
      val hash = combined.digest().map("%02x".format(_)).mkString
      replicaMd5 = hash
      val manifest = java.nio.file.Paths.get(s"$dst/_replica.md5")
      if (java.nio.file.Files.exists(manifest)) {
        val stored = new String(java.nio.file.Files.readAllBytes(manifest),
          "UTF-8").trim
        if (stored == hash)
          println(s"[sf1probe] replica bytes verified: $hash")
        else
          println(s"[sf1probe] WARNING replica bytes CHANGED: " +
            s"stored=$stored now=$hash — ratios are NOT comparable to " +
            "eras measured on the old bytes")
      } else {
        java.nio.file.Files.write(manifest, hash.getBytes("UTF-8"))
        println(s"[sf1probe] replica manifest written: $hash")
      }
    }

    // the forest-blocked operators follow the documented sizing rule
    // (SURVEY §4): bits per table scale with log(corpus) to pin bucket
    // occupancy — fixed graded-query bits at 10x the data square the
    // per-bucket self-join (measured 27.9x / 126.7x before scaling).
    // Occupancy here: 2k/2^8 ~ 8/bucket at sf0.1 vs 20k/2^11 ~ 10 at
    // sf1 (similarity_join); 2k/2^4 ~ 125 vs 20k/2^7 ~ 156 (semantic).
    def bitsFor(dir: String, base: Int): Int =
      if (dir == dst) base + 3 else base
    // the declared mine_triplets query's planted corpus (anchor copies
    // perturbed on one axis), shared by the scaled entry and the
    // candidate-count diagnostic below
    def tripletCorpus(s: SparkSession, dir: String): DataFrame = {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val vd = col("embedding").cast("array<double>")
      val perturbed = emb.filter(col("vec_id") % 10 === 0)
        .select((col("vec_id") + 10000).as("vec_id"),
          concat(array(element_at(vd, 1) + 0.1), slice(vd, 2, 63)).as("embedding"))
      emb.select(col("vec_id"), vd.as("embedding")).unionByName(perturbed)
    }
    val scaled: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "similarity_join" -> ((s: SparkSession, dir: String) => {
        import graft.operators.{AnnLsh, Knn}
        AnnLsh.similarityJoin(
          s.read.parquet(s"$dir/embeddings.parquet")
            .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")),
          "embedding", "vec_id", 3, 20, bitsFor(dir, 8), 64, Knn.Cosine)
      }),
      // the CAPPED forest path at scale (round-16): same geometry as
      // the scaled similarity_join, cap 4096 non-binding at either sf
      // — the ratio isolates what the bounded LongTopKAgg cut itself
      // costs when the key frame grows 10x (it must scale like the
      // key frame: one keyed agg, <= cap rows per bucket per
      // partition map-side)
      "similarity_join_capped" -> ((s: SparkSession, dir: String) => {
        import graft.operators.{AnnLsh, Knn}
        AnnLsh.similarityJoin(
          s.read.parquet(s"$dir/embeddings.parquet")
            .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")),
          "embedding", "vec_id", 3, 20, bitsFor(dir, 8), 64, Knn.Cosine,
          bucketCap = Some(4096))
      }),
      "dedup_semantic" -> ((s: SparkSession, dir: String) => {
        import graft.operators.Dedup
        Dedup.semanticDedup(
          s.read.parquet(s"$dir/embeddings.parquet")
            .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")),
          "embedding", "vec_id", 4, bitsFor(dir, 4), 64, tau = 0.99)
      }),
      "mine_hard_negatives" -> ((s: SparkSession, dir: String) => {
        import graft.operators.{AnnLsh, Knn}
        AnnLsh.hardNegatives(
          s.read.parquet(s"$dir/embeddings.parquet")
            .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding")),
          "embedding", "vec_id", 3, 20, bitsFor(dir, 8), 64, Knn.Cosine,
          dMin = 0.01, dMax = 0.45)
      }),
      "mine_triplets" -> ((s: SparkSession, dir: String) => {
        import graft.operators.{AnnLsh, Knn}
        AnnLsh.mineTriplets(tripletCorpus(s, dir), "embedding", "vec_id",
          2, 20, bitsFor(dir, 8), 64, Knn.Cosine, 0.15, 0.15, 0.45)
      }),
      "tokenize_bpe_256" -> ((s: SparkSession, dir: String) => {
        import graft.operators.Bpe
        // REAL-vocab training scale (VERDICT r12 #1 / r13 #1): 256
        // merges through the batched rounds — the graded 8-merge query
        // proves correctness, this line proves the per-round (not
        // per-merge) job cost is what survives a tokenizer-sized merge
        // budget. Training runs eagerly inside the timed region; the
        // merge table is the (tiny) result frame.
        val docs = s.read.parquet(s"$dir/documents.parquet")
        val (merges, _) = Bpe.train(docs, "text", numMerges = 256)
        Bpe.mergeTable(s, merges)
      }))
    // optional name filter (any non-flag arg): probe just those lines
    // — the cheap way to re-run an A/A pair on a few queries after a
    // replica rebuild without paying the full ~14-min sweep
    val only = args.filterNot(_ == "export-only").toSet
    val allQs = names.map(n => n -> SparkEntry.queries(n)) ++ scaled
    val qs = if (only.isEmpty) allQs
      else allQs.filter { case (n, _) => only(n) }
    def run(fn: (SparkSession, String) => DataFrame, dir: String): Unit =
      fn(spark, dir).queryExecution.toRdd.count()
    qs.foreach { case (_, fn) =>
      try run(fn, "/root/testdata/sf0.001") catch { case _: Throwable => } }

    def bench(dir: String): Map[String, Double] = {
      qs.foreach { case (name, fn) =>
        try run(fn, dir)
        catch { case e: Throwable =>
          println(s"[sf1probe] warm $name@$dir FAILED: ${e.getMessage}") } }
      val samples = collection.mutable.LinkedHashMap[String, Vector[Double]]()
      for (_ <- 1 to 3) qs.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try run(fn, dir)
        catch { case e: Throwable =>
          println(s"[sf1probe] $name@$dir FAILED: ${e.getMessage}") }
        samples(name) = samples.getOrElse(name, Vector.empty) :+
          ((System.nanoTime() - t0) / 1e9)
      }
      samples.map { case (k, v) => k -> v.sorted.apply(1) }.toMap
    }

    // "export-only" arg skips the query bench (re-measure just the
    // export lines without paying the full probe)
    if (!args.contains("export-only")) {
      val base = bench(src)
      val big = bench(dst)
      qs.map(_._1).foreach { n =>
        println(f"[sf1probe] $n%-20s sf0.1=${base(n)}%6.2f s  sf1=${big(n)}%7.2f s  ratio=${big(n) / base(n)}%5.1f x")
        out.add("q" -> n, "sf01_sec" -> base(n), "sf1_sec" -> big(n),
          "ratio" -> big(n) / base(n))
      }
      println(f"[sf1probe] TOTAL sf0.1=${base.values.sum}%.1f s  sf1=${big.values.sum}%.1f s  ratio=${big.values.sum / base.values.sum}%.1f x")
      out.add("q" -> "TOTAL", "sf01_sec" -> base.values.sum,
        "sf1_sec" -> big.values.sum,
        "ratio" -> big.values.sum / base.values.sum)
    }
    // mine_triplets' sf1 band (13-22x across eras, VERDICT r12 #6) is
    // candidate-volume geometry, not execution pathology — record the
    // forest candidate-pair count for the EXACT probed geometry at
    // both scales so every A/A run logs (time ratio, candidate ratio)
    // side by side; the AnnSpec pin guarantees this diagnostic counts
    // precisely what the operator scores.
    if (qs.exists(_._1 == "mine_triplets")) {
      import graft.operators.AnnLsh
      val counts = Seq(src, dst).map { dir =>
        dir -> AnnLsh.forestCandidatePairs(tripletCorpus(spark, dir),
          "embedding", "vec_id", 20, bitsFor(dir, 8), 64)
      }
      counts.foreach { case (dir, n) =>
        println(s"[sf1probe] mine_triplets candidate pairs @$dir = $n") }
      println(f"[sf1probe] mine_triplets candidate ratio = ${counts(1)._2.toDouble / counts(0)._2}%.1f x")
      out.add("q" -> "mine_triplets_candidates",
        "sf01_pairs" -> counts(0)._2, "sf1_pairs" -> counts(1)._2,
        "ratio" -> counts(1)._2.toDouble / counts(0)._2)
    }
    if (only.nonEmpty) { spark.stop(); return }

    // The actual 100 TB workflow end-to-end (VERDICT r10 #6): curation
    // -> loader-ready shards. Timed through the WRITE (plan execution
    // + partitionBy(shard) parquet layout), median of 3 after a warm
    // pass, like everything above. Two lines, because the replicated
    // corpus's word-suffixed copies FAIL pipeline_curate's quality
    // funnel (suffixes destroy stopword/lang stats), so the curated
    // line's write side stays ~1x at sf1 (measured pipeline_curate
    // itself is ~0.9-1x here for the same reason):
    //  - export_raw: shuffleShards + partitioned write over the FULL
    //    documents table — the honest 10x measurement of the export
    //    machinery (per-shard rank window + streaming write);
    //  - export_curated: the composed workflow line (funnel scans 10x,
    //    write ~1x).
    def export(mk: String => DataFrame, dir: String, out: String): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.sources.Sources.writeTrainingShards(
          mk(dir), "doc_id", "exp0", 64, out)
        (System.nanoTime() - t0) / 1e9
      }
      once()
      Vector(once(), once(), once()).sorted.apply(1)
    }
    val rawDocs = (dir: String) =>
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
    val curated = (dir: String) => {
      val split = SparkEntry.queries("pipeline_curate")(spark, dir)
      split.filter(col("split") === "train")
        .select(col("doc_id")).join(rawDocs(dir), "doc_id")
    }
    for ((mk, tag) <- Seq((rawDocs, "export_raw"), (curated, "export_curated"))) {
      val eBase = export(mk, src, "/tmp/graft-export-sf01")
      val eBig = export(mk, dst, "/tmp/graft-export-sf1")
      println(f"[sf1probe] $tag%-20s sf0.1=$eBase%6.2f s  sf1=$eBig%7.2f s  ratio=${eBig / eBase}%5.1f x")
      out.add("q" -> tag, "sf01_sec" -> eBase, "sf1_sec" -> eBig,
        "ratio" -> eBig / eBase)
    }
    // the artifact covers the FULL sweep only: a name-filtered,
    // export-only, or non-default-core invocation must not overwrite
    // the committed table with a partial/incomparable one
    if (args.isEmpty && cpus == "32") out.write("replica_md5" -> replicaMd5)
    spark.stop()
  }
}
