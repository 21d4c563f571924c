package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = (0L until 1000L).map { i =>
    (i, s"src${i % 4}", s"doc $i body " + ("w " * (i % 50).toInt))
  }.toDF("doc_id", "source", "text")

  test("stratified sampling is deterministic and hits per-stratum rates") {
    val rates = Map("src0" -> 0.5, "src1" -> 0.1)
    val s1 = Sampling.stratified(corpus, "doc_id", col("source"), rates, defaultRate = 0.0)
    val s2 = Sampling.stratified(corpus, "doc_id", col("source"), rates, defaultRate = 0.0)
    // identical output across runs — no RNG state anywhere
    assert(s1.select("doc_id").as[Long].collect().sorted.toSeq ==
      s2.select("doc_id").as[Long].collect().sorted.toSeq)
    val bySrc = s1.groupBy("source").count().as[(String, Long)].collect().toMap
    // 250 docs per stratum; md5 uniformity keeps realized rates near target
    assert(math.abs(bySrc("src0") / 250.0 - 0.5) < 0.15, s"src0: ${bySrc.get("src0")}")
    assert(math.abs(bySrc.getOrElse("src1", 0L) / 250.0 - 0.1) < 0.08, s"src1: ${bySrc.get("src1")}")
    assert(!bySrc.contains("src2") && !bySrc.contains("src3")) // default 0.0
    // membership matches the hash rule exactly (engine-parity contract)
    val kept = s1.filter(col("source") === "src0").select("doc_id").as[Long].collect().toSet
    val expected = (0L until 1000L).filter(i => i % 4 == 0)
      .filter(i => graft.operators.AnnLsh.hash64Local(i.toString) % 1000000L < 500000L).toSet
    assert(kept == expected)
  }

  test("weighted sampling: rate clamps, NULL drops, membership matches the hash rule") {
    val rated = corpus.withColumn("q",
      when(col("doc_id") < 100, lit(null).cast("double")) // unscorable docs
        .when(col("doc_id") < 200, -0.5)                  // clamps to 0 -> dropped
        .when(col("doc_id") < 300, 2.0)                   // clamps to 1 -> always kept
        .otherwise(col("doc_id") / 1000.0))
    val s = Sampling.weighted(rated, "doc_id", col("q"))
    val kept = s.select("doc_id").as[Long].collect().toSet
    assert(kept.forall(_ >= 200), "NULL and negative rates must drop")
    assert((200L until 300L).forall(kept), "rate 1.0 keeps everything")
    // ramp region follows the exact md5-Bernoulli rule
    val expected = (300L until 1000L).filter(i =>
      graft.operators.AnnLsh.hash64Local(i.toString) % 1000000L < (i / 1000.0) * 1000000L).toSet
    assert(kept.filter(_ >= 300) == expected)
    // emitted rate is the clamped value (reweighting contract)
    val r250 = s.filter(col("doc_id") === 250).select("sample_rate").as[Double].head()
    assert(r250 == 1.0)
    // determinism across runs
    assert(Sampling.weighted(rated, "doc_id", col("q"))
      .select("doc_id").as[Long].collect().toSet == kept)
  }

  test("mixRates caps at 1.0 and hits the doc budget when available") {
    val rates = Sampling.mixRates(corpus, col("source"),
      Map("src0" -> 0.8, "src1" -> 0.2), budgetDocs = 200)
    // src0 wants 160 of 250 -> 0.64; src1 wants 40 of 250 -> 0.16
    assert(math.abs(rates("src0") - 0.64) < 1e-9)
    assert(math.abs(rates("src1") - 0.16) < 1e-9)
    // a budget larger than the stratum caps at 1.0
    val capped = Sampling.mixRates(corpus, col("source"),
      Map("src0" -> 1.0), budgetDocs = 10000)
    assert(capped("src0") == 1.0)
    // unknown stratum -> rate 0, not a crash
    assert(Sampling.mixRates(corpus, col("source"),
      Map("nope" -> 1.0), budgetDocs = 10)("nope") == 0.0)
  }

  test("packSequences assigns windows by start offset, parallel per group") {
    val docs = Seq(
      (1L, "g1", 300), (2L, "g1", 300), (3L, "g1", 300), (4L, "g1", 50),
      (10L, "g2", 600)
    ).toDF("id", "grp", "n_tok")
    val packed = Sampling.packSequences(docs, "id", col("n_tok"), col("grp"), 512)
      .select(col("id"), col("pack_id")).as[(Long, Long)].collect().toMap
    // g1 offsets: 0, 300, 600, 900 -> windows 0, 0, 1, 1
    assert(packed(1L) == 0L && packed(2L) == 0L)
    assert(packed(3L) == 1L && packed(4L) == 1L)
    // g2 starts at its own offset 0 — groups never interleave
    assert(packed(10L) == 0L)
    val stats = Sampling.packStats(docs, "id", col("n_tok"), col("grp"), 512)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(stats == Set(("g1", 0L, 2L, 600L), ("g1", 1L, 2L, 350L), ("g2", 0L, 1L, 600L)))
    // plan check: the window is partitioned (no global-window warning path)
    val plan = Sampling.packSequences(docs, "id", col("n_tok"), col("grp"), 512)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partitionBy") || plan.contains("PartitionSpec") ||
      !plan.contains("No Partition Defined"))
  }

  test("shuffleShards: deterministic dense per-shard ranks; seed changes the permutation") {
    val a = Sampling.shuffleShards(corpus, "doc_id", "s1", 8)
      .select("doc_id", "shuffle_key", "shard", "shard_pos")
      .as[(Long, Long, Int, Long)].collect().sortBy(_._1)
    val b = Sampling.shuffleShards(corpus, "doc_id", "s1", 8)
      .select("doc_id", "shuffle_key", "shard", "shard_pos")
      .as[(Long, Long, Int, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq) // reproducible across runs
    assert(a.length == 1000)   // no row lost or duplicated
    a.foreach { case (_, key, shard, _) =>
      assert(shard == (key % 8).toInt && shard >= 0)
    }
    // positions within each shard are exactly 1..n (dense, no gaps)
    a.groupBy(_._3).foreach { case (shard, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq, s"shard $shard")
    }
    // a different seed yields a genuinely different permutation
    val c = Sampling.shuffleShards(corpus, "doc_id", "s2", 8)
      .select("doc_id", "shard", "shard_pos").as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(c.map(r => (r._2, r._3)).toSeq != a.map(r => (r._3, r._4)).toSeq)
  }

  test("stratified hash agrees with the dedup hash64 (oracle parity)") {
    val h = corpus.limit(5).select(col("doc_id"),
      (Dedup.hash64(col("doc_id").cast("string")) % 1000000L).as("h"))
      .as[(Long, Long)].collect()
    h.foreach { case (id, hv) =>
      assert(hv == graft.operators.AnnLsh.hash64Local(id.toString) % 1000000L)
    }
  }

  test("exactSample draws exactly k per stratum, deterministically") {
    val got = Sampling.exactSample(corpus, "doc_id", col("source"), k = 30, seed = "s0")
      .as[(String, Long, Int)].collect()
    // exactly k per stratum (every stratum has 250 > k docs)
    got.groupBy(_._1).foreach { case (s, rows) =>
      assert(rows.length == 30, s"stratum $s")
      assert(rows.map(_._3).sorted.toSeq == (1 to 30)) // dense ranks
    }
    // membership = the k smallest hashes, independent of partitioning
    val expected = (0L until 1000L).groupBy(i => s"src${i % 4}").map { case (s, ids) =>
      s -> ids.sortBy(i =>
        (graft.operators.AnnLsh.hash64Local(s"s0_$i").toDouble, i)).take(30).toSet
    }
    got.groupBy(_._1).foreach { case (s, rows) =>
      assert(rows.map(_._2).toSet == expected(s), s"stratum $s")
    }
    // repeat run identical; different seed draws a different sample
    val again = Sampling.exactSample(corpus, "doc_id", col("source"), 30, "s0")
      .as[(String, Long, Int)].collect()
    assert(again.sortBy(r => (r._1, r._3)).toSeq == got.sortBy(r => (r._1, r._3)).toSeq)
    val other = Sampling.exactSample(corpus, "doc_id", col("source"), 30, "s1")
      .as[(String, Long, Int)].collect()
    assert(other.map(r => (r._1, r._2)).toSet != got.map(r => (r._1, r._2)).toSet)
  }

  test("temperatureRates up-weights low-resource sources at alpha = 1/2") {
    // 900 vs 100 docs: sqrt masses 30/10 -> p = 0.75/0.25; at budget
    // 200 expected draws 150/50 -> rates 1/6 and 1/2 — the small
    // source samples at 3x its proportional rate (0.2/0.2)
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (1001 to 1100).map(i => (i.toLong, "small"))).toDF("doc_id", "source")
    val rates = Sampling.temperatureRates(df, col("source"), budgetDocs = 200)
    assert(math.abs(rates("big") - 200.0 * 30.0 / 40.0 / 900.0) < 1e-15)
    assert(math.abs(rates("small") - 200.0 * 10.0 / 40.0 / 100.0) < 1e-15)
    assert(rates("small") / rates("big") > 2.9)
    // the realized sample tracks the expected counts (md5 uniformity)
    val got = Sampling.stratified(df, "doc_id", col("source"), rates)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(math.abs(got("big") - 150.0) < 40 && math.abs(got("small") - 50.0) < 25,
      s"realized $got")
    // a tiny budget over a tiny source caps at rate 1.0
    val capped = Sampling.temperatureRates(df.limit(10), col("source"), 10000)
    assert(capped.values.forall(_ == 1.0))
  }

  test("kfoldSplit: clusters share a fold, folds are balanced and seed-keyed") {
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val folds = Sampling.kfoldSplit(
        corpus.select(col("doc_id")), "doc_id", pairs, k = 5, seed = "cv")
      .as[(Long, Long, Int)].collect()
    assert(folds.length == 1000 && folds.forall(r => r._3 >= 0 && r._3 < 5))
    val byFold = folds.map(r => r._1 -> r._3).toMap
    // whole near-dup clusters land in ONE fold — no fold's held-out
    // set contains a near-dup of another fold's training data
    assert(Set(byFold(0L), byFold(1L), byFold(2L)).size == 1)
    assert(byFold(10L) == byFold(11L))
    // md5 uniformity: every fold is populated, none dominates
    val sizes = folds.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.keySet == (0 until 5).toSet)
    assert(sizes.values.max < 300 && sizes.values.min > 120, s"fold sizes $sizes")
    // a different seed permutes assignments
    val other = Sampling.kfoldSplit(
        corpus.select(col("doc_id")), "doc_id", pairs, 5, "cv2")
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r._3).toMap
    assert(other != byFold)
  }

  test("leakageSafeSplit never lets a near-dup pair straddle the boundary") {
    // clusters: chain 0-1-2, pair 10-11; everything else singleton
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val split = Sampling.leakageSafeSplit(
      corpus.select(col("doc_id")), "doc_id", pairs, evalFrac = 0.2, seed = "s0")
      .as[(Long, Long, String)].collect()
    assert(split.length == 1000 && split.map(_._1).distinct.length == 1000)
    val bySide = split.map(r => r._1 -> r._3).toMap
    // entire clusters land on ONE side — the leakage contract
    assert(Set(bySide(0L), bySide(1L), bySide(2L)).size == 1)
    assert(bySide(10L) == bySide(11L))
    // cluster members share the split_key (= component min id)
    val keys = split.map(r => r._1 -> r._2).toMap
    assert(keys(0L) == 0L && keys(1L) == 0L && keys(2L) == 0L)
    assert(keys(10L) == 10L && keys(11L) == 10L)
    assert(keys(500L) == 500L) // singleton keys on itself
    // realized eval fraction tracks the target (md5 uniformity)
    val evalFrac = split.count(_._3 == "eval") / 1000.0
    assert(math.abs(evalFrac - 0.2) < 0.08, s"eval frac $evalFrac")
    // deterministic across runs; a different seed moves the boundary
    val again = Sampling.leakageSafeSplit(
      corpus.select(col("doc_id")), "doc_id", pairs, 0.2, "s0")
      .as[(Long, Long, String)].collect()
    assert(again.sortBy(_._1).toSeq == split.sortBy(_._1).toSeq)
    val other = Sampling.leakageSafeSplit(
      corpus.select(col("doc_id")), "doc_id", pairs, 0.2, "s1")
      .as[(Long, Long, String)].collect()
    assert(other.map(r => r._1 -> r._3).toMap != bySide)
  }

  test("balancedSample takes exactly min-class-count per stratum, deterministically") {
    val df = (Seq.tabulate(5)(i => (i.toLong, "a")) ++
      Seq((100L, "b"), (101L, "b")) ++
      Seq.tabulate(3)(i => (200L + i, "c"))).toDF("doc_id", "lbl")
    val got = Sampling.balancedSample(df, "doc_id", col("lbl"), "s1")
      .select("stratum", "doc_id").as[(String, Long)].collect()
    // cap = |b| = 2: every stratum contributes exactly 2 rows
    assert(got.groupBy(_._1).view.mapValues(_.length).toMap ==
      Map("a" -> 2, "b" -> 2, "c" -> 2))
    // partitioning-independent and a subset of the input
    val again = Sampling.balancedSample(df.repartition(7), "doc_id",
        col("lbl"), "s1")
      .select("stratum", "doc_id").as[(String, Long)].collect()
    assert(got.toSet == again.toSet)
    assert(got.map(_._2).toSet.subsetOf(df.select("doc_id").as[Long].collect().toSet))
  }

  test("dsirWeights matches a brute-force local model bit-for-bit") {
    val raw = Seq((1L, "the cat sat"), (2L, "xq zr wk"),
      (3L, "the dog sat"), (4L, ""), (5L, "the the")).toDF("doc_id", "text")
    val target = Seq((10L, "the cat ran"), (11L, "the dog ran"))
      .toDF("doc_id", "text")
    val B = 64
    def grams(t: String): Seq[String] = {
      val w = t.split(" ").filter(_.nonEmpty).toSeq
      w ++ w.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    }
    def bkt(g: String): Long = graft.operators.AnnLsh.hash64Local(g) % B
    val tCnt = Seq("the cat ran", "the dog ran").flatMap(grams)
      .groupBy(bkt).view.mapValues(_.size.toLong).toMap
    val rCnt = Seq("the cat sat", "xq zr wk", "the dog sat", "", "the the")
      .flatMap(grams).groupBy(bkt).view.mapValues(_.size.toLong).toMap
    val tt = tCnt.values.sum; val tr = rCnt.values.sum
    def lr(b: Long): Double =
      math.log((tCnt.getOrElse(b, 0L) + 1.0) / (tt + B)) -
        math.log((rCnt(b) + 1.0) / (tr + B))
    def expect(t: String): Double =
      grams(t).foldLeft(0.0)((a, g) => a + lr(bkt(g)))
    val got = Sampling.dsirWeights(raw, "doc_id", "text", target, "text", B)
      .select("doc_id", "n_grams", "dsir_logw").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((5L, expect("the cat sat"))))   // exact doubles:
    assert(got(2L) == ((5L, expect("xq zr wk"))))      // same fold order
    assert(got(4L) == ((0L, 0.0)))                     // empty text kept
    assert(got(5L) == ((3L, expect("the the"))))
    // directional signal: target-like docs outweigh vocabulary soup
    assert(got(1L)._2 > got(2L)._2 && got(3L)._2 > got(2L)._2)
  }

  test("dsirWeights is partitioning-independent; dsirSample is a deterministic top-k") {
    val raw = (0L until 300L).map(i => (i,
      if (i % 3 == 0) "alpha beta gamma delta" else "omega psi chi phi"))
      .toDF("doc_id", "text")
    val target = Seq((0L, "alpha beta gamma")).toDF("doc_id", "text")
    def w(d: org.apache.spark.sql.DataFrame) =
      Sampling.dsirWeights(d, "doc_id", "text", target, "text", 128)
        .select("doc_id", "dsir_logw").as[(Long, Double)].collect().sorted.toSeq
    assert(w(raw) == w(raw.repartition(11)))
    val s1 = Sampling.dsirSample(raw, "doc_id", "text", target, "text",
      k = 40, buckets = 128).select("doc_id").as[Long].collect().toSeq
    val s2 = Sampling.dsirSample(raw.repartition(7), "doc_id", "text",
      target, "text", k = 40, buckets = 128)
      .select("doc_id").as[Long].collect().toSeq
    assert(s1.length == 40 && s1 == s2) // ordered top-k, stable
    // Gumbel-top-k still favors target-like docs in aggregate
    val hits = s1.count(_ % 3 == 0)
    assert(hits > 30, s"target-like docs in sample: $hits/40")
  }

  test("trainDsir + dsirScoreAll: the deployment split is bit-equal to dsirWeights") {
    val raw = (0L until 120L).map(i => (i,
      if (i % 4 == 0) "alpha beta gamma delta" else s"omega psi chi phi t$i"))
      .toDF("doc_id", "text")
    val target = Seq((0L, "alpha beta gamma")).toDF("doc_id", "text")
    val model = Sampling.trainDsir(raw, "text", target, "text", buckets = 128)
    assert(model.length == 128)
    val batch = Sampling.dsirWeights(raw, "doc_id", "text", target, "text", 128)
      .select("doc_id", "n_grams", "dsir_logw")
      .as[(Long, Long, Double)].collect().sorted.toSeq
    val deployed = Sampling.dsirScoreAll(raw, "doc_id", "text", model)
      .select("doc_id", "n_grams", "dsir_logw")
      .as[(Long, Long, Double)].collect().sorted.toSeq
    assert(deployed == batch)
    // the deployed plan is join-free: the model is a literal
    val plan = Sampling.dsirScoreAll(raw, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan.take(600))
  }

  test("dsir model subtree scans each corpus once (VERDICT r13 #2)") {
    // the r13 shape re-aggregated the corpus for its _tr/_tt totals —
    // ReuseExchange did not dedupe them, so the executed plan carried
    // FOUR full gram passes over documents.parquet. The histogram-agg
    // model build must hold exactly TWO corpus FileScans (raw grams +
    // target grams), and the scoring plan ONE with no join at all.
    val docs = graft.core.Tables.documents(spark, sf0001)
    val target = docs.filter(col("doc_id") % 7 === 0)
    val modelPlan = Sampling.dsirModelRow(docs, "text", target, "text", 256)
      .queryExecution.executedPlan.toString
    val modelScans = modelPlan.linesIterator.count(_.contains("FileScan"))
    assert(modelScans == 2, s"expected 2 model FileScans, got $modelScans:\n" +
      modelPlan.linesIterator.filter(_.contains("FileScan")).mkString("\n"))
    val scorePlan = Sampling.dsirWeights(docs, "doc_id", "text", target,
        "text", buckets = 256)
      .queryExecution.executedPlan.toString
    val scoreScans = scorePlan.linesIterator.count(_.contains("FileScan"))
    assert(scoreScans == 1 && !scorePlan.contains("Join"),
      s"scoring must be one join-free scan:\n$scorePlan")
  }

  test("dsir raw-unseen buckets hold the smoothed logratio, not 0 (ADVICE r12)") {
    // raw grams: aaa, bbb, ccc + 2 bigrams (tr=5); target: xxx (tt=1)
    val raw = Seq((0L, "aaa bbb ccc")).toDF("doc_id", "text")
    val target = Seq((0L, "xxx")).toDF("doc_id", "text")
    val B = 64
    val model = Sampling.trainDsir(raw, "text", target, "text", buckets = B)
    assert(model.length == B)
    // buckets unseen by BOTH corpora: Laplace-neutral ln((tr+B)/(tt+B)),
    // not the old silent 0.0 — at most 5 raw + 1 target buckets differ
    val neutral = math.log(1.0 / (1 + B)) - math.log(1.0 / (5 + B))
    assert(model.count(_ == neutral) >= B - 6,
      s"neutral=${model.count(_ == neutral)}")
    assert(!model.contains(0.0))
    // a NEW document whose gram the raw corpus never saw scores the
    // model entry for its bucket (nonzero), not a silent 0.0
    val score = Sampling.dsirScoreAll(
        Seq((9L, "qqq")).toDF("doc_id", "text"), "doc_id", "text", model)
      .select("dsir_logw").as[Double].head()
    val bkt = spark.range(1)
      .select((graft.operators.Dedup.hash64(lit("qqq")) % B).cast("int"))
      .head().getInt(0)
    assert(score == model(bkt) && score != 0.0)
  }

  test("dsir scoring pass never shuffles the corpus (broadcast-only plan)") {
    val raw = (0L until 100L).map(i => (i, s"tok$i common words here"))
      .toDF("doc_id", "text")
    val target = raw.limit(10)
    val plan = Sampling.dsirWeights(raw, "doc_id", "text", target, "text", 256)
      .queryExecution.executedPlan.toString
    // the model rides inside the codegen'd kernel: the scoring plan
    // has NO join and NO exchange of any kind (stronger than the old
    // broadcast-attach shape this test used to allow)
    assert(!plan.contains("Join") && !plan.contains("Exchange"), plan.take(800))
  }

  test("quantileStrata: equal-population bins, exact per-bin draw, partitioning-independent") {
    val rows = (0L until 200L).map(i => (i, (i * 7) % 200))
    val df = rows.toDF("id", "v")
    val got = Sampling.quantileStrata(df, "id", "v", bins = 4, perBin = 6,
        sampleK = 256)
      .as[(Long, Double, Long, Int)].collect()
    assert(got.length == 24)
    val byBin = got.groupBy(_._3)
    assert(byBin.keySet == Set(0L, 1L, 2L, 3L))
    byBin.values.foreach(b => assert(b.length == 6))
    // bins are value-ordered and non-overlapping
    val ranges = byBin.toSeq.sortBy(_._1)
      .map { case (b, xs) => (b, xs.map(_._2).min, xs.map(_._2).max) }
    ranges.sliding(2).foreach {
      case Seq((_, _, hi), (_, lo, _)) => assert(hi < lo, ranges.toString)
      case _ =>
    }
    val again = Sampling.quantileStrata(df.repartition(7), "id", "v",
        bins = 4, perBin = 6, sampleK = 256)
      .as[(Long, Double, Long, Int)].collect()
    assert(again.toSet == got.toSet)
  }

  test("epochMix repeats docs floor(rate) times plus a Bernoulli fractional epoch") {
    // 4 docs per source; weights/budget give rates a=2.0, b=1.5, c=0.25
    val docs = (0L until 12L).map(i =>
      (i, Seq("a", "b", "c")((i % 3).toInt))).toDF("doc_id", "src")
    val w = Map("a" -> 0.5, "b" -> 0.375, "c" -> 0.0625)
    val got = Sampling.epochMix(docs, "doc_id", col("src"), w, budgetDocs = 16L)
      .select(col("doc_id"), col("src"), col("epoch"))
      .as[(Long, String, Long)].collect().toSeq
    val bySrc = got.groupBy(_._2)
    // a: rate 2.0 exactly -> every a-doc appears exactly twice (epochs 0, 1)
    val aDocs = (0L until 12L).filter(_ % 3 == 0)
    assert(bySrc("a").groupBy(_._1).view.mapValues(_.map(_._3).sorted).toMap ==
      aDocs.map(_ -> Seq(0L, 1L)).toMap)
    // b: every b-doc has epoch 0; extras (epoch 1) only via the
    // md5-Bernoulli at frac 0.5 — mirror it locally
    def hv(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16) % 1000000L
    }
    val bDocs = (0L until 12L).filter(_ % 3 == 1)
    bDocs.foreach { id =>
      val eps = bySrc("b").filter(_._1 == id).map(_._3).sorted
      val expect = if (hv(id) < (1.5 - 1.0) * 1000000L) Seq(0L, 1L) else Seq(0L)
      assert(eps == expect, s"doc $id")
    }
    // c: rate 0.25 < 1 -> pure Bernoulli, no epoch beyond 0
    val cRows = bySrc.getOrElse("c", Seq.empty)
    assert(cRows.forall(_._3 == 0L))
    val cDocs = (0L until 12L).filter(_ % 3 == 2)
    assert(cRows.map(_._1).toSet == cDocs.filter(id => hv(id) < 250000L).toSet)
    // partitioning-independent
    val again = Sampling.epochMix(docs.repartition(5), "doc_id", col("src"),
        w, 16L).select(col("doc_id"), col("src"), col("epoch"))
      .as[(Long, String, Long)].collect().toSeq
    assert(again.sorted == got.sorted)
    // the plan agrees with the materialization's shape
    val plan = Sampling.epochPlan(docs, col("src"), w, 16L)
      .as[(String, Long, Double, Double, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(plan("a") == (("a", 4L, 0.5, 2.0, 2L, 0.0)))
    assert(plan("b") == (("b", 4L, 0.375, 1.5, 1L, 0.5)))
    assert(plan("c") == (("c", 4L, 0.0625, 0.25, 0L, 0.25)))
  }
}
