package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{AnnLsh, Dedup, Knn, TextAnalysis}

/** 10x scale probe for the round-7 operators: sf0.1 documents (5k)
  * unioned as 10 id-shifted copies (50k docs) — a worst-case
  * heavy-duplication corpus where every chunk/gram recurs 10x, so
  * boilerplate detection and the n-gram profile see maximum join
  * fanout. Embeddings replicate 10x for the kNN graph. Measures wall
  * time at 1x and 10x; writes TEXTSCALE_PROBE.json (VERDICT r17 #6:
  * committed, regenerable artifact).
  * Run: sbt "Test/runMain graft.TextScaleProbe" */
object TextScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val out = new ProbeJson("textscale",
      args.headOption.getOrElse("/root/repo/TEXTSCALE_PROBE.json"))
    val base = Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
    val big = (0 until 10).map(s =>
        base.select((col("doc_id") + s * 1000000L).as("doc_id"), col("text"),
          col("source"), col("lang")))
      .reduce(_ unionByName _).repartition(32).cache()
    println(s"[probe] docs big=${big.count()}")
    val one = base.repartition(32).cache(); one.count()

    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val bigEmb = (0 until 10).map(s =>
        emb.select((col("vec_id") + s * 1000000L).as("vec_id"), col("embedding")))
      .reduce(_ unionByName _).repartition(32).cache()
    println(s"[probe] vecs big=${bigEmb.count()}")
    val oneEmb = emb.repartition(32).cache(); oneEmb.count()

    def time(mk: () => org.apache.spark.sql.DataFrame, label: String,
             tag: String): Unit = {
      mk().queryExecution.toRdd.count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $label $tag median=${ts(1)}%.2f s")
      out.add("line" -> label, "scale" -> tag, "sec" -> ts(1))
    }

    for ((df, tag) <- Seq((one, "1x"), (big, "10x"))) {
      time(() => TextAnalysis.removeBoilerplate(df, "text", "doc_id", 8, 1),
        "remove_boilerplate", tag)
      time(() => TextAnalysis.corpusNgrams(df, "text", "doc_id", 3, 50),
        "corpus_ngrams", tag)
      val bench = df.filter(col("source") === "src0")
        .select(col("doc_id").as("bid"), col("text").as("btext"))
      time(() => Dedup.decontaminateNear(
        df.filter(col("source") =!= "src0"), "text", "doc_id",
        bench, "btext", "bid"), "decontaminate_near", tag)
    }
    // dup-heavy substring shape (VERDICT r10 #3): with 10 copies of
    // every doc, virtually EVERY window hash is duplicated — the
    // dup-hash join side grows to the distinct-window count, the shape
    // where a forced broadcast would OOM (AQE sizes it and falls back
    // to SMJ; DedupSpec pins correctness under that fallback). Both
    // variants must hold near-linear here.
    for ((df, tag) <- Seq((one, "1x"), (big, "10x"))) {
      // measure the dup-hash (join build) side's actual growth, not
      // just wall time: at the 10-copies shape it approaches the full
      // distinct-window count — the number that decides broadcast vs
      // SMJ at scale
      val wins = Dedup.windowHashRows(df, "text", "doc_id", 8)
      val dupHashes = wins.groupBy(col("h"))
        .agg(count(lit(1)).as("c")).filter(col("c") >= 2).count()
      val nWins = wins.count()
      println(s"[probe] windows $tag = $nWins, " +
        s"dup-hash build side = $dupHashes rows")
      out.add("line" -> "window_hashes", "scale" -> tag,
        "windows" -> nWins, "dup_hash_rows" -> dupHashes)
      time(() => Dedup.duplicatedSpans(df, "text", "doc_id", minLen = 8),
        "dedup_substring", tag)
      time(() => Dedup.duplicatedSpansKeepFirst(df, "text", "doc_id",
        minLen = 8), "dedup_substring_keep", tag)
    }
    // keep-best + the curate-v2 composition at the SAME dup-torture
    // shape (VERDICT r11 #5): with 10 exact copies of every doc, every
    // near-dup cluster has >= 10 members, so keep-best's winner join
    // fans out by cluster size and the pair graph approaches
    // clusters x C(10,2) — the worst case for the CC driver guard and
    // the cluster-keyed aggs
    def keepBest(df: org.apache.spark.sql.DataFrame) = {
      val pairs = Dedup.minhashPairs(df, "text", "doc_id",
        numHashes = 16, bands = 4, shingleN = 3, threshold = 0.5)
      val scores = df.select(col("doc_id"),
        size(filter(split(col("text"), " "), t => t =!= ""))
          .cast("long").as("n_tokens"))
      Dedup.dedupKeepBest(df, "doc_id", pairs, scores, "n_tokens")
    }
    def curateV2(df: org.apache.spark.sql.DataFrame) = {
      // the pipeline_curate_v2 stages over an arbitrary corpus frame:
      // funnel -> trained-kernel gate (the deployment classifier,
      // bit-equal to the distributed gate) -> keep-best + split via
      // the streaming roll-up (stage-identical by the curate_stream
      // contract). Training is INSIDE the timed region, as in the
      // declared query.
      val kept = TextAnalysis.filterFunnel(df, "text",
          minTokens = 20, maxTokens = 90, keepLangs = Seq("en"), minStop = 0.02)
        .filter(col("verdict") === "kept")
        .select(col("doc_id"), col("text"))
      val model = TextAnalysis.trainNaiveBayes(
        df.filter(col("doc_id") % 5 =!= 0), "text", "lang", 4096)
      val gated = TextAnalysis.naiveBayesScoreAll(kept, "text", "doc_id",
          model, carry = Seq("text"))
        .filter(col("pred") === "en")
        .select(col("doc_id"), col("text"), col("pred").as("pred_lang"),
          size(filter(split(col("text"), " "), t => t =!= ""))
            .cast("long").as("n_tokens"))
      graft.streaming.Ingest.curateResolve(gated, "text", "doc_id")
    }
    for ((df, tag) <- Seq((one, "1x"), (big, "10x"))) {
      val nPairs = Dedup.minhashPairs(df, "text", "doc_id",
        numHashes = 16, bands = 4, shingleN = 3, threshold = 0.5).count()
      val kbPlan = keepBest(df)
      kbPlan.queryExecution.toRdd.count()
      val ep = kbPlan.queryExecution.executedPlan.toString
      val joins = "(SortMergeJoin|BroadcastHashJoin)".r
        .findAllIn(ep).toSeq.groupBy(identity).view.mapValues(_.size).toMap
      println(s"[probe] keep_best $tag pair graph = $nPairs pairs, " +
        s"executed joins = $joins")
      out.add("line" -> "keep_best_pair_graph", "scale" -> tag,
        "pairs" -> nPairs)
      time(() => keepBest(df), "dedup_keep_best", tag)
      time(() => curateV2(df), "pipeline_curate_v2", tag)
    }
    // similarityJoin and embeddingPairsForest are canonicalize-first
    // since round 8: 10 exact copies of every vector (the worst dup
    // shape — previously 138.9 s raw at 10x) must now stay within ~4x
    // of the 1x wall, because the forest self-join only ever sees the
    // canonical vectors and members inherit neighbors by expansion.
    for ((df, tag) <- Seq((oneEmb, "1x"), (bigEmb, "10x"))) {
      time(() => AnnLsh.similarityJoin(df, "embedding", "vec_id", 3,
        20, 8, 64, Knn.Cosine), "similarity_join", tag)
      time(() => Dedup.embeddingPairsForest(df, "embedding", "vec_id",
        4, 8, 64, 0.9), "embedding_pairs_forest", tag)
    }
    out.write()
    spark.stop()
  }
}
